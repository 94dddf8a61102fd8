"""Deterministic synthetic CDC fixtures (seed=42, no wall-clock).

Models the reference's change semantics per FIXTURES.md:

* op codes / envelope from ``AvroChangeRecord`` / ``AvroChangeType``
  (reference entity/.../model/AvroChangeRecord.java:43-58,
  AvroChangeType.java:22-38): 3=INSERT, 4=UPDATE, 5=DELETE, 0/1/2=schema ops;
* total ordering from ``TransactionId.sequence``
  (reference entity/.../model/TransactionId.java:30-43) → ``event_seq``;
* at-least-once redelivery (~3% exact duplicate dedup keys, same or next
  epoch) mirroring the "read offset ahead of committed → potential resends"
  path (reference messaging/.../kafka/BaseKafkaConsumer.java:182-188);
* ~2% out-of-order ``op_ts`` and ~1% exact-timestamp ties (tie-break by
  ``event_seq``);
* a hot repo holding ≥30% of paths/events (skew fixture);
* ~0.1% malformed events (null key / bad op / content on DELETE) for the DLQ
  path (reference messaging/.../processing/MessageProcessor.java:216-225);
* three in-band schema episodes: add ``size_bytes:long`` (epoch 3), rename
  ``lang``→``language`` (epoch 5), widen ``rev`` int→long (epoch 6), per the
  evolution rules of SchemaEvolutionValidator.java:543-555.

Everything is generated vectorized in numpy/pandas; ``content`` is a pure
function of ``(repo, path, rev)`` so every update changes its sha256 and the
oracle can verify per-row ``sha256(content)`` equality.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42
N_EPOCHS = 8
BASE_TS = 1_600_000_000_000  # synthetic monotone epoch-millis base

OP_SCHEMA_CREATE, OP_SCHEMA_UPDATE, OP_SCHEMA_DELETE = 0, 1, 2
OP_INSERT, OP_UPDATE, OP_DELETE = 3, 4, 5
DATA_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

# epoch → schema version active from that epoch on (episodes per FIXTURES.md §3)
SCHEMA_EPISODES = {0: "1.0", 3: "1.1", 5: "2.0", 6: "2.1"}

LANGS = ["python", "java", "go", "rust", "markdown", "yaml"]
EXTS = {"python": "py", "java": "java", "go": "go", "rust": "rs", "markdown": "md", "yaml": "yaml"}

EVENT_COLUMNS = [
    "op", "repo", "path", "commit", "lang", "language", "content",
    "size_bytes", "rev", "op_ts", "event_seq", "txid", "schema_version",
    "checkpoint_epoch",
]


@dataclass
class Scale:
    name: str
    n_paths: int          # initial source_repos rows
    n_events: int         # target data-event count (pre-dup/malformed)
    repeat: tuple = (4, 8)  # content = sha256hex * repeat → 256–512B.. blocks

    @property
    def n_repos(self) -> int:
        return max(6, self.n_paths // 400)


SCALES = {
    "t1": Scale("t1", n_paths=2_000, n_events=20_000, repeat=(4, 8)),
    "t2": Scale("t2", n_paths=50_000, n_events=500_000, repeat=(2, 4)),
    "bench": Scale("bench", n_paths=500_000, n_events=5_000_000, repeat=(1, 2)),
    # scaling-efficiency fixture: big enough that executor CPU dominates
    # per-job driver overhead (the N-vs-4N measurement, BASELINE.md)
    "scale": Scale("scale", n_paths=2_000_000, n_events=20_000_000, repeat=(4, 8)),
}


def _sha_series(s: pd.Series) -> pd.Series:
    return s.map(lambda x: hashlib.sha256(x.encode()).hexdigest())


def content_of(repo: pd.Series, path: pd.Series, rev: pd.Series, repeat: tuple) -> pd.Series:
    """content(repo,path,rev) = sha256hex("repo|path|rev") repeated r times,
    r = rmin + rev % (rmax - rmin + 1). Pure + deterministic."""
    rmin, rmax = repeat
    h = _sha_series(repo.astype(str) + "|" + path.astype(str) + "|" + rev.astype(str))
    reps = (rmin + (rev.astype(np.int64) % (rmax - rmin + 1))).astype(int)
    return h.str.repeat(reps) if hasattr(h.str, "repeat") else h * reps


def commit_of(repo: pd.Series, path: pd.Series, rev: pd.Series) -> pd.Series:
    return _sha_series(repo.astype(str) + "|" + path.astype(str) + "|" + rev.astype(str) + "|commit").str[:40]


def _version_for_epoch(epoch: np.ndarray) -> np.ndarray:
    out = np.full(epoch.shape, "1.0", dtype=object)
    for ep, ver in sorted(SCHEMA_EPISODES.items()):
        out[epoch >= ep] = ver
    return out


@dataclass
class Fixture:
    scale: Scale
    source_repos: pd.DataFrame
    change_events: pd.DataFrame          # includes dups + malformed + schema ops


def _make_keys(sc: Scale, rng: np.random.Generator):
    """Key universe: initial keys (in source_repos) + new keys (born by INSERT).
    Hot repo org0/repo0 gets ≥30% of all paths (skew fixture)."""
    n_new = max(1, int(sc.n_events * 0.30 / 2.2))  # ~30% inserts / avg chain ≈ 2.2
    n_keys = sc.n_paths + n_new
    n_hot = int(n_keys * 0.32)
    repo_names = np.array(
        ["org0/repo0"] + [f"org{i // 10 + 1}/repo{i % 10}" for i in range(sc.n_repos - 1)],
        dtype=object,
    )
    # Zipf-ish assignment for the non-hot repos
    w = 1.0 / np.arange(1, sc.n_repos)  # weights for repos 1..n-1
    w = w / w.sum()
    cold_assign = rng.choice(np.arange(1, sc.n_repos), size=n_keys - n_hot, p=w)
    repo_idx = np.concatenate([np.zeros(n_hot, dtype=np.int64), cold_assign])
    rng.shuffle(repo_idx)
    lang_idx = rng.integers(0, len(LANGS), size=n_keys)
    langs = np.array(LANGS, dtype=object)[lang_idx]
    exts = np.array([EXTS[l] for l in LANGS], dtype=object)[lang_idx]
    # unique path per (repo, key ordinal)
    ordinal = np.arange(n_keys)
    paths = np.array(
        [f"src/pkg{o % 97}/mod{o}.{e}" for o, e in zip(ordinal, exts)], dtype=object
    )
    repos = repo_names[repo_idx]
    is_initial = np.zeros(n_keys, dtype=bool)
    is_initial[rng.choice(n_keys, size=sc.n_paths, replace=False)] = True
    return repos, paths, langs, is_initial


def generate(scale: str | Scale = "t1") -> Fixture:
    sc = SCALES[scale] if isinstance(scale, str) else scale
    rng = np.random.default_rng(SEED)

    repos, paths, langs, is_initial = _make_keys(sc, rng)
    n_keys = len(repos)

    # ---- source_repos: initial table state (rev=1 content) -----------------
    init = pd.DataFrame({
        "repo": repos[is_initial], "path": paths[is_initial], "lang": langs[is_initial],
    })
    init["rev0"] = 1
    init["commit"] = commit_of(init["repo"], init["path"], init["rev0"])
    init["content"] = content_of(init["repo"], init["path"], init["rev0"], sc.repeat)
    source_repos = init[["repo", "path", "commit", "lang", "content"]].reset_index(drop=True)

    # ---- event chains per key ----------------------------------------------
    # which keys emit events: all new keys + ~60% of initial keys
    emits = ~is_initial | (rng.random(n_keys) < 0.60)
    key_ids = np.flatnonzero(emits)
    lengths = rng.integers(1, 5, size=len(key_ids))  # 1..4 events per key
    # scale lengths to hit ~n_events
    total = lengths.sum()
    if total < sc.n_events:
        extra = rng.choice(len(key_ids), size=sc.n_events - total, replace=True)
        np.add.at(lengths, extra, 1)
    # per-key pattern: 0=updates-only, 1=ends-with-delete (~15%), 2=delete-reinsert (~5%)
    pat = rng.choice([0, 1, 2], size=len(key_ids), p=[0.80, 0.15, 0.05])
    lengths = np.where((pat == 2) & (lengths < 3), 3, lengths)

    ev_key = np.repeat(key_ids, lengths)
    n_ev = len(ev_key)
    # position within chain
    starts = np.zeros(len(key_ids), dtype=np.int64)
    starts[1:] = np.cumsum(lengths)[:-1]
    pos = np.arange(n_ev) - np.repeat(starts, lengths)
    ev_len = np.repeat(lengths, lengths)
    ev_pat = np.repeat(pat, lengths)
    ev_is_new = ~is_initial[ev_key]

    op = np.full(n_ev, OP_UPDATE, dtype=np.int64)
    op[(pos == 0) & ev_is_new] = OP_INSERT
    op[(ev_pat == 1) & (pos == ev_len - 1)] = OP_DELETE
    # delete-reinsert chain: ... D at pos L-2, I at pos L-1
    op[(ev_pat == 2) & (pos == ev_len - 2)] = OP_DELETE
    op[(ev_pat == 2) & (pos == ev_len - 1)] = OP_INSERT

    base_rev = np.where(is_initial[ev_key], 1, 0)
    rev = base_rev + pos + 1

    # ---- global interleave: merge per-key sequences by synthetic time ------
    key_start = rng.uniform(0, 1e9, size=n_keys)
    gaps = rng.exponential(5_000.0, size=n_ev) + 1.0
    cum = np.cumsum(gaps)
    seg_base = cum[starts] - gaps[starts]  # cumulative *before* each chain start
    t = key_start[ev_key] + (cum - np.repeat(seg_base, lengths))
    order = np.argsort(t, kind="stable")

    df = pd.DataFrame({
        "op": op[order],
        "_key": ev_key[order],
        "repo": repos[ev_key[order]],
        "path": paths[ev_key[order]],
        "_lang": langs[ev_key[order]],
        "rev": rev[order],
        "op_ts": (BASE_TS + t[order]).astype(np.int64),
    })
    n = len(df)
    df["event_seq"] = np.arange(1, n + 1, dtype=np.int64)
    # monotone-ize op_ts with seq (mostly), then perturb
    df["op_ts"] = BASE_TS + np.sort(df["op_ts"].to_numpy() - BASE_TS)
    ooo = rng.random(n) < 0.02   # ~2% out-of-order
    df.loc[ooo, "op_ts"] -= rng.integers(10_000, 5_000_000, size=int(ooo.sum()))
    tie = np.flatnonzero(rng.random(n) < 0.01)  # ~1% exact-ts ties
    tie = tie[tie > 0]
    ts = df["op_ts"].to_numpy().copy()
    ts[tie] = ts[tie - 1]
    df["op_ts"] = ts

    # epochs: equal-count buckets over event_seq
    df["checkpoint_epoch"] = ((df["event_seq"] - 1) * N_EPOCHS // n).astype(np.int32)
    df["schema_version"] = _version_for_epoch(df["checkpoint_epoch"].to_numpy())

    # widen episode: from epoch 6 (v2.1) some revs exceed int32
    wide = (df["checkpoint_epoch"] >= 6) & (rng.random(n) < 0.10)
    df.loc[wide, "rev"] = df.loc[wide, "rev"] + 2**31

    # payload — content only for non-deletes (DELETE content is None by
    # contract; hashing it first just to mask it wastes ~18% of gen time)
    is_del = df["op"] == OP_DELETE
    df["commit"] = commit_of(df["repo"], df["path"], df["rev"])
    nd = ~is_del
    content = pd.Series(None, index=df.index, dtype=object)
    content.loc[nd] = content_of(df.loc[nd, "repo"], df.loc[nd, "path"],
                                 df.loc[nd, "rev"], sc.repeat)
    df["content"] = content
    # size_bytes only carried under schema >= 1.1
    has_size = df["schema_version"].isin(["1.1", "2.0", "2.1"]) & ~is_del
    df["size_bytes"] = pd.array(
        np.where(has_size, content.str.len(), None), dtype="Int64"
    )
    # lang vs language: renamed from schema 2.0 on
    renamed = df["schema_version"].isin(["2.0", "2.1"])
    df["lang"] = df["_lang"].where(~renamed & ~is_del, None)
    df["language"] = df["_lang"].where(renamed & ~is_del, None)
    # txid: runs of 1..50 events share a transaction id
    tx_draw = rng.integers(1, 51, size=n // 10 + 2)
    tx_bounds = np.cumsum(tx_draw)
    df["txid"] = np.searchsorted(tx_bounds, np.arange(n), side="right") + 1

    clean = df.drop(columns=["_key", "_lang"]).reset_index(drop=True)

    # ---- schema-op events (op=1) at episode epochs --------------------------
    schema_rows = []
    for ep, ver in SCHEMA_EPISODES.items():
        if ep == 0:
            continue
        schema_rows.append({
            "op": OP_SCHEMA_UPDATE, "repo": "__schema__", "path": "source_repos",
            "commit": None, "lang": None, "language": None, "content": None,
            "size_bytes": None, "rev": None,
            "op_ts": int(clean.loc[clean["checkpoint_epoch"] == ep, "op_ts"].min()) - 1,
            "event_seq": 0,  # renumbered below
            "txid": 0, "schema_version": ver, "checkpoint_epoch": ep,
        })
    schema_df = pd.DataFrame(schema_rows)

    full = pd.concat([clean, schema_df], ignore_index=True)
    # renumber by (epoch, original seq): schema ops (seq=0) sort first in their
    # epoch; per-key original order is preserved, and the ~2% op_ts
    # out-of-orderness vs event_seq survives (the LWW tie-break fixture).
    full = full.sort_values(["checkpoint_epoch", "event_seq"], kind="stable").reset_index(drop=True)
    full["event_seq"] = np.arange(1, len(full) + 1, dtype=np.int64)

    # ---- at-least-once duplicates (~3%, same or next epoch) ----------------
    m = len(full)
    dup_idx = np.flatnonzero((rng.random(m) < 0.03) & full["op"].isin(DATA_OPS).to_numpy())
    dups = full.iloc[dup_idx].copy()
    bump = rng.random(len(dups)) < 0.5
    dups["checkpoint_epoch"] = np.minimum(
        dups["checkpoint_epoch"].to_numpy() + bump.astype(np.int32), N_EPOCHS - 1
    )

    # ---- malformed events (~0.1%) for the DLQ path -------------------------
    bad_idx = np.flatnonzero((rng.random(m) < 0.001) & full["op"].isin(DATA_OPS).to_numpy())
    bad = full.iloc[bad_idx].copy()
    kinds = rng.integers(0, 3, size=len(bad))
    bad["event_seq"] = full["event_seq"].max() + 1 + np.arange(len(bad))
    bad.loc[kinds == 0, "repo"] = None                      # null key
    bad.loc[kinds == 1, "op"] = 9                           # op outside 0..5
    if (kinds == 2).any():                                  # content on DELETE
        sel = bad.index[kinds == 2]
        bad.loc[sel, "op"] = OP_DELETE
        bad.loc[sel, "content"] = "corrupt-" + bad.loc[sel, "path"].astype(str)

    events = pd.concat([full, dups, bad], ignore_index=True)
    events = events.sort_values(["checkpoint_epoch", "event_seq"], kind="stable").reset_index(drop=True)
    events = events[EVENT_COLUMNS]
    # normalize dtypes (all-null partitions must still write string parquet cols)
    for c in ("repo", "path", "commit", "lang", "language", "content", "schema_version"):
        events[c] = events[c].astype("string")
    events["op"] = events["op"].astype(np.int64)
    events["rev"] = pd.array(events["rev"], dtype="Int64")
    events["op_ts"] = events["op_ts"].astype(np.int64)
    events["event_seq"] = events["event_seq"].astype(np.int64)
    events["txid"] = events["txid"].astype(np.int64)
    events["size_bytes"] = pd.array(events["size_bytes"], dtype="Int64")

    return Fixture(scale=sc, source_repos=source_repos, change_events=events)


def generator_fingerprint() -> str:
    """sha256 of this module's source. Fixture-cache markers embed it, so any
    edit to the generator invalidates stale caches instead of silently
    benchmarking (or verifying against) data the current code no longer
    produces. Loader-based so it also works when shipped inside a
    --py-files zip."""
    loader = globals().get("__loader__")
    try:
        text = loader.get_source(__name__)
    except Exception:  # noqa: BLE001 — plain-file fallback
        text = None
    if text is None:
        with open(__file__) as f:
            text = f.read()
    return hashlib.sha256(text.encode()).hexdigest()[:16]


#: the one shared fixture-cache root (bench.py, the scaling harness and the
#: isolation probe all key off this — a drifted copy would silently double
#: multi-GB fixture generation across two caches)
DEFAULT_CACHE = "/tmp/cdc_bench_cache"


def ensure_fixture(cache_root: str, scale: str) -> str:
    """Materialize (or reuse) the parquet fixture for ``scale`` under
    ``cache_root`` — the single shared implementation for bench.py, the
    scaling harness, and the verify driver."""
    import shutil
    d = os.path.join(cache_root, scale)
    marker = os.path.join(d, "_DONE")
    want = generator_fingerprint()
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = f.read().strip()
    if have != want:
        shutil.rmtree(d, ignore_errors=True)
        write_fixture(d, scale)
        with open(marker, "w") as f:
            f.write(want)
    return d


# ---------------------------------------------------------------------------
# Registry fixture: versioned schemas per SchemaVersion.path() layout
# (reference entity/.../schema/SchemaVersion.java:45-47)
# ---------------------------------------------------------------------------

def registry_docs() -> list[dict]:
    base = [
        {"name": "repo", "type": "string", "nullable": False, "key": True},
        {"name": "path", "type": "string", "nullable": False, "key": True},
        {"name": "commit", "type": "string", "nullable": True},
        {"name": "lang", "type": "string", "nullable": True},
        {"name": "content", "type": "string", "nullable": True},
        {"name": "rev", "type": "int", "nullable": True},
    ]
    v11 = [dict(f) for f in base] + [{"name": "size_bytes", "type": "long", "nullable": True}]
    v20 = [({**f, "name": "language"} if f["name"] == "lang" else dict(f)) for f in v11]
    v21 = [({**f, "type": "long"} if f["name"] == "rev" else dict(f)) for f in v20]
    return [
        {"entity": "source_repos", "major": 1, "minor": 0, "fields": base, "aliases": {}},
        {"entity": "source_repos", "major": 1, "minor": 1, "fields": v11, "aliases": {}},
        {"entity": "source_repos", "major": 2, "minor": 0, "fields": v20, "aliases": {"lang": "language"}},
        {"entity": "source_repos", "major": 2, "minor": 1, "fields": v21, "aliases": {"lang": "language"}},
    ]


def write_fixture(out_dir: str, scale: str = "t1") -> Fixture:
    """Materialize parquet fixtures: source_repos.parquet + change_events/
    (hive-partitioned by checkpoint_epoch for partition pruning) + registry/."""
    fx = generate(scale)
    os.makedirs(out_dir, exist_ok=True)
    # row_group_size bounds scan granularity: Spark splits parquet only at
    # row-group boundaries, so a single-group file would serialize every scan
    # onto one task regardless of cluster size.
    rg = 65536
    fx.source_repos.to_parquet(os.path.join(out_dir, "source_repos.parquet"),
                               index=False, row_group_size=rg)
    ev_dir = os.path.join(out_dir, "change_events")
    os.makedirs(ev_dir, exist_ok=True)
    for ep, part in fx.change_events.groupby("checkpoint_epoch"):
        pdir = os.path.join(ev_dir, f"checkpoint_epoch={ep}")
        os.makedirs(pdir, exist_ok=True)
        part.drop(columns=["checkpoint_epoch"]).to_parquet(
            os.path.join(pdir, "part-0.parquet"), index=False, row_group_size=rg
        )
    reg_dir = os.path.join(out_dir, "registry", "source_repos")
    os.makedirs(reg_dir, exist_ok=True)
    for doc in registry_docs():
        with open(os.path.join(reg_dir, f'{doc["major"]}.{doc["minor"]}.json'), "w") as f:
            json.dump(doc, f, indent=1)
    return fx
