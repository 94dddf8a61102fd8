"""Git repository sync source — turns a git repo's commit history into the
engine's change-event stream (SURVEY §2.1 "Git repo sync"; the reference
deployment ingests source-code repositories, and the north-rule input table
is exactly `(repo, path, commit, lang, content)`).

Spark-first split of the work:

* **Listing is metadata.** One ``git log --reverse --first-parent
  --diff-merges=first-parent --raw`` per repo yields the full
  `(op, path, commit, ts)` envelope plus entry modes (how submodule
  gitlinks are recognized and skipped) — O(history) text, tiny
  next to blob bytes. For a fleet of repos, run one listing per task
  (``mapInPandas`` over a repo table); a single repo's listing is a
  justified driver step the same way an epoch directory listing is.
* **Content is hydrated DISTRIBUTED.** ``fetch_blob_contents`` runs one
  ``git cat-file --batch`` subprocess PER PARTITION and streams all of that
  partition's ``commit:path`` queries through a single pipe — batched
  external I/O amortized over the partition, never a per-row process spawn
  (the per-row-Python trap's subprocess cousin).

Rename handling: listed with ``--no-renames`` so a rename surfaces as
DELETE(old path) + INSERT(new path) — exactly the keyed-CDC semantics the
engine applies (the key IS (repo, path); there is no rename op).

Ordering: events are versioned ``(op_ts = commit seconds × 1000,
event_seq = global running counter)`` — commits in the same second stay
totally ordered by seq, matching the engine's LWW contract. ``op_ts`` is
clamped non-decreasing along the first-parent chain so a skewed author
clock can never make an older mainline state win LWW.
"""

from __future__ import annotations

import os
import subprocess
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_core_spark.engine import OP_DELETE, OP_INSERT, OP_UPDATE

_STATUS_OP = {"A": OP_INSERT, "M": OP_UPDATE, "D": OP_DELETE}

META_DDL = ("op bigint, repo string, path string, commit string, rev bigint, "
            "op_ts bigint, event_seq bigint")


def _git_env() -> dict:
    """Subprocess env with repo-redirecting GIT_* variables dropped: an
    ambient GIT_DIR / GIT_WORK_TREE / GIT_INDEX_FILE overrides ``git -C``
    and would silently point every listing and hydration call at the wrong
    repository (config scopes are left alone — log/cat-file reads are
    config-neutral)."""
    return {k: v for k, v in os.environ.items()
            if k not in ("GIT_DIR", "GIT_WORK_TREE", "GIT_INDEX_FILE")}


def _git(repo_dir: str, *args: str) -> str:
    return subprocess.run(["git", "-C", repo_dir, *args], check=True,
                          capture_output=True, text=True,
                          env=_git_env()).stdout


def _unquote(path: str) -> str:
    """git C-quotes paths containing specials (spaces are literal, but
    quotes/backslashes/non-ASCII arrive as '"a\\"b.txt"') — decode them so
    the event key matches the real path. A path whose bytes are not valid
    UTF-8 (legacy latin-1 commits) raises a NAMED error instead of a bare
    UnicodeDecodeError: the connector keys events by a unicode path column
    and hydrates blobs by that same string, so a lossy decode would point
    ``commit:path`` lookups at bytes the odb doesn't have — fail loudly at
    listing time with the remediation in the message (same contract as the
    newline-in-path guard)."""
    if not (path.startswith('"') and path.endswith('"')):
        return path
    raw = (path[1:-1].encode("latin-1", "backslashreplace")
           .decode("unicode_escape").encode("latin-1"))
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(
            f"git path {path!r} is not valid UTF-8 ({exc}) — re-encode the "
            "filename in the source repo (git mv) or exclude it upstream; "
            "a lossy decode here would break blob hydration for the path"
        ) from exc


def list_change_events(repo_dir: str, repo_name: str) -> list[dict]:
    """Commit-history listing → change-event envelope rows (no content yet).
    ``rev`` is the 0-based commit index — the per-path max rev after replay
    identifies the last commit that touched each surviving path."""
    # --first-parent + --diff-merges=first-parent: walk the MAINLINE chain
    # and diff every commit (merges included) against its first parent, so
    # the event stream is the linear sequence of tree deltas ending at HEAD
    # — side-branch work arrives as the merge commit's delta, and conflict
    # resolutions ("evil merges") are captured instead of silently dropped
    # (plain --name-status emits NOTHING for merge commits). Replay
    # convergence to HEAD then holds by construction, independent of
    # author-clock skew on side branches.
    # --raw (not --name-status): raw lines carry src/dst MODES, which is the
    # only way to see submodule gitlinks (mode 160000) — name-status lists a
    # gitlink change as an ordinary A/M path, and hydrating it would query a
    # commit object absent from this repo's odb and kill the whole ingest.
    # Gitlink entries are filtered here at listing time; a submodule is not
    # file content and has no blob to hydrate.
    out = _git(repo_dir, "log", "--reverse", "--first-parent",
               "--diff-merges=first-parent", "--no-renames", "--raw",
               "--abbrev=40", "--format=\x01%H %ct")
    rows: list[dict] = []
    commit = ts = None
    rev = -1
    seq = 0
    for line in out.splitlines():
        if line.startswith("\x01"):
            commit, ts_s = line[1:].split()
            # clamp non-decreasing: git commit times are author clocks, and
            # a skewed mainline commit must not lose LWW to its predecessor
            # (event_seq breaks exact ties, but not a BACKWARDS clock)
            ts = max(int(ts_s) * 1000, ts or 0)
            rev += 1
            continue
        if not line.startswith(":"):
            continue
        meta_part, _, path = line.partition("\t")
        src_mode, dst_mode, _src, _dst, status = meta_part[1:].split()[:5]
        op = _STATUS_OP.get(status[:1])
        if op is None:   # T (typechange) et al.: treat as update
            op = OP_UPDATE
        # the mode that must be a blob is the surviving side: dst for
        # add/modify, src for delete. 160000 there = submodule pointer —
        # skip. (T from gitlink→blob keeps dst 100644 and hydrates fine.)
        live_mode = src_mode if op == OP_DELETE else dst_mode
        if live_mode == "160000":
            if op != OP_DELETE and src_mode not in ("000000", "160000"):
                # typechange blob→gitlink: the submodule itself is not
                # ingestable, but the path's OLD file row must still go —
                # skipping outright would leave stale content at a path
                # HEAD's tree no longer has, breaking replay convergence
                op = OP_DELETE
            else:
                continue
        try:
            upath = _unquote(path)
        except ValueError as exc:
            raise ValueError(
                f"repo {repo_name!r} commit {commit}: {exc}") from exc
        if "\n" in upath:
            # `cat-file --batch` input is newline-delimited and this git
            # (< 2.42) has no -Z mode, so a decoded newline would split one
            # hydration query into two bogus ones and desync the stream —
            # fail loudly at LISTING time, before any event is emitted
            raise ValueError(
                f"git path {path!r} in commit {commit} contains a newline; "
                "the cat-file batch protocol cannot query it (needs git >= "
                "2.42 -Z) — rename the file or exclude it upstream")
        rows.append({"op": op, "repo": repo_name, "path": upath,
                     "commit": commit, "rev": rev, "op_ts": ts,
                     "event_seq": seq})
        seq += 1
    return rows


def fetch_blob_contents(meta: DataFrame, repo_dir: str,
                        on_binary: str = "base64") -> DataFrame:
    """Hydrate ``content``/``size_bytes`` for non-delete events: one
    ``git cat-file --batch`` per partition, queries streamed down a single
    pipe (write request → read sized response, sequentially — deadlock-free
    without pipelining). Executors need filesystem access to ``repo_dir``
    (local clone / shared mount), the same locality contract as any
    file-based source.

    Non-UTF-8 blobs (images, compiled artifacts) cannot ride the string
    ``content`` column verbatim; ``on_binary`` picks the policy:

    * ``"base64"`` (default) — LOSSLESS: content is the Base64 text of the
      raw bytes and ``is_binary`` is true, so a consumer can round-trip
      (``unbase64``) the exact blob;
    * ``"replace"`` — lossy U+FFFD replacement decode (the cheap option
      when binaries are known garbage downstream);
    * ``"error"`` — fail the ingest (strict text-only repos).

    Valid UTF-8 text is identical under all three, ``is_binary`` false."""
    if on_binary not in ("base64", "replace", "error"):
        raise ValueError("on_binary must be 'base64', 'replace' or 'error'")
    out_ddl = (META_DDL
               + ", content string, size_bytes bigint, is_binary boolean")

    def hydrate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64
        proc = None
        try:
            for pdf in it:
                contents: list[str | None] = []
                sizes: list[int | None] = []
                binflags: list[bool | None] = []
                for op, commit, path in zip(pdf["op"], pdf["commit"],
                                            pdf["path"]):
                    if int(op) == OP_DELETE:
                        contents.append(None)
                        sizes.append(None)
                        binflags.append(None)
                        continue
                    if proc is None:
                        proc = subprocess.Popen(
                            ["git", "-C", repo_dir, "cat-file", "--batch"],
                            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                            env=_git_env())
                    proc.stdin.write(f"{commit}:{path}\n".encode())
                    proc.stdin.flush()
                    header = proc.stdout.readline().decode().split()
                    if header[-1] in ("missing", "ambiguous"):
                        raise FileNotFoundError(
                            f"{commit}:{path} not in {repo_dir}")
                    size = int(header[2])
                    blob = proc.stdout.read(size)
                    proc.stdout.read(1)  # trailing newline
                    try:
                        contents.append(blob.decode("utf-8"))
                        binflags.append(False)
                    except UnicodeDecodeError:
                        if on_binary == "error":
                            raise ValueError(
                                f"{commit}:{path} is not valid UTF-8 and "
                                "on_binary='error'")
                        if on_binary == "base64":
                            contents.append(
                                base64.b64encode(blob).decode("ascii"))
                        else:
                            contents.append(
                                blob.decode("utf-8", errors="replace"))
                        binflags.append(True)
                    sizes.append(size)
                pdf = pdf.copy()
                pdf["content"] = pd.Series(contents, dtype="string")
                pdf["size_bytes"] = pd.Series(sizes, dtype="Int64")
                pdf["is_binary"] = pd.Series(binflags, dtype="boolean")
                yield pdf
        finally:
            if proc is not None:
                proc.stdin.close()
                proc.wait()

    return meta.mapInPandas(hydrate, schema=out_ddl)


def events_from_git(spark: SparkSession, repo_dir: str, repo_name: str,
                    schema_version: str = "1.1",
                    commits_per_epoch: int = 1,
                    on_binary: str = "base64") -> DataFrame:
    """Full connector: listing + distributed hydration + engine envelope.
    ``checkpoint_epoch = rev // commits_per_epoch`` so a long history replays
    as resumable epochs (exactly-once manifests per epoch, same as any other
    source). Output columns match the engine's event contract for
    ``schema_version`` 1.x (``lang`` derived from the path extension);
    non-UTF-8 blobs follow ``on_binary`` (see ``fetch_blob_contents``)."""
    rows = list_change_events(repo_dir, repo_name)
    meta = spark.createDataFrame(pd.DataFrame(
        rows, columns=["op", "repo", "path", "commit", "rev", "op_ts",
                       "event_seq"]), schema=META_DDL)
    hydrated = fetch_blob_contents(meta, repo_dir, on_binary=on_binary)
    ext = F.regexp_extract("path", r"\.([A-Za-z0-9_]+)$", 1)
    return (hydrated
            .withColumn("lang", F.when(ext != "", ext))
            .withColumn("txid", F.col("rev"))
            .withColumn("schema_version", F.lit(schema_version))
            .withColumn("checkpoint_epoch",
                        (F.col("rev") / F.lit(commits_per_epoch))
                        .cast("int")))
