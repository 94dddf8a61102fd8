"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting (min-hash of word
shingles — a winnowing-style rolling fingerprint).

Everything is built-in pyspark.sql.functions (JVM, whole-stage codegen);
each operator has an exactly-equivalent ANSI-SQL form used as the DuckDB
oracle, so Spark and oracle compute the same deterministic result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
}


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count_ws(col) -> Column:
    """Whitespace token count. Empty/whitespace-only input counts 0 —
    split('') yields [''] (size 1), which would diverge from the \\S+
    oracle form and wave empty docs through min-token filters."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")))


def token_count_bpe(col) -> Column:
    """BPE-ish token count: alpha runs + digit runs + individual symbols."""
    return F.regexp_count(_c(col), F.lit(BPE_TOKEN_RE))


def occurrences(col, needle: str) -> Column:
    """Count of a literal substring — (len(s) - len(replace(s, n, ''))) / len(n),
    chosen because it is expressible identically in Spark and DuckDB SQL."""
    c = F.lower(_c(col))
    return ((F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))).cast("long")


def lang_id(col) -> Column:
    """Marker-stopword language heuristic with deterministic tiebreak
    (alphabetical language order; 'und' = undetermined when no marker hits)."""
    scores = {lang: sum_cols([occurrences(col, m) for m in ms])
              for lang, ms in LANG_MARKERS.items()}
    expr = F.lit("und")
    # evaluate in reverse-alphabetical so earlier langs win ties via >=
    for lang in sorted(LANG_MARKERS, reverse=True):
        s = scores[lang]
        cond = s > F.lit(0)
        for other in sorted(LANG_MARKERS):
            if other == lang:
                break
            cond = cond & (s > scores[other])  # strictly beat alphabetically-earlier
        for other in sorted(LANG_MARKERS):
            if other > lang:
                cond = cond & (s >= scores[other])  # ties go to earlier
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length, word
    diversity proxy (mean word length band), penalizes symbol density."""
    c = _c(col)
    n_chars = F.length(c).cast("double")
    n_tok = token_count_ws(col).cast("double")
    mean_wl = n_chars / F.greatest(n_tok, F.lit(1.0))
    sym = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]")).cast("double") / F.greatest(n_chars, F.lit(1.0))
    len_score = F.least(n_chars / F.lit(2000.0), F.lit(1.0))
    wl_score = F.lit(1.0) - F.least(F.abs(mean_wl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    sym_score = F.lit(1.0) - F.least(sym * F.lit(4.0), F.lit(1.0))
    # no rounding: the formula is a fixed IEEE-754 expression tree, so Spark
    # and the SQL oracle produce bit-identical doubles; rounding would
    # re-introduce engine-specific HALF_UP vs HALF_EVEN tie behavior
    return F.lit(0.4) * len_score + F.lit(0.3) * wl_score + F.lit(0.3) * sym_score


def quality_score_sql(col: str) -> str:
    """The exact same formula as ANSI SQL (DuckDB oracle form)."""
    n_chars = f"cast(length({col}) as double)"
    n_tok = f"cast(len(regexp_extract_all(trim({col}), '\\S+')) as double)"
    mean_wl = f"({n_chars} / greatest({n_tok}, 1.0))"
    sym = f"(cast(len(regexp_extract_all({col}, '[^A-Za-z0-9\\s]')) as double) / greatest({n_chars}, 1.0))"
    len_score = f"least({n_chars} / 2000.0, 1.0)"
    wl_score = f"(1.0 - least(abs({mean_wl} - 5.0) / 5.0, 1.0))"
    sym_score = f"(1.0 - least({sym} * 4.0, 1.0))"
    return f"(0.4 * {len_score} + 0.3 * {wl_score} + 0.3 * {sym_score})"


def lang_id_sql(col: str) -> str:
    """lang_id as ANSI SQL (same semantics, for the DuckDB oracle)."""
    def occ(needle: str) -> str:
        n = needle.replace("'", "''")
        return (f"((length(lower({col})) - length(replace(lower({col}), '{n}', '')))"
                f" / {len(needle)})")
    score = {lang: "(" + " + ".join(occ(m) for m in ms) + ")"
             for lang, ms in LANG_MARKERS.items()}
    expr = "'und'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        conds = [f"{score[lang]} > 0"]
        for other in sorted(LANG_MARKERS):
            if other == lang:
                break
            conds.append(f"{score[lang]} > {score[other]}")
        for other in sorted(LANG_MARKERS):
            if other > lang:
                conds.append(f"{score[lang]} >= {score[other]}")
        expr = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {expr} END"
    return expr


def word_shingles(col, k: int = 5) -> Column:
    """Array of k-word shingles (space-joined), zip-shift construction (see
    cdc_core_spark.operators.dedup.word_ngrams for why not slice-per-index)."""
    from cdc_core_spark.operators.dedup import word_ngrams
    toks = F.split(F.trim(F.lower(_c(col))), r"\s+")
    return word_ngrams(toks, k)


def fingerprint(col, k: int = 5) -> Column:
    """Winnowing-style document fingerprint: lexicographic min of
    sha256(shingle) over all k-word shingles — stable under content moves,
    identical in Spark and DuckDB (both expose sha256 hex)."""
    return F.array_min(F.transform(word_shingles(col, k), lambda s: F.sha2(s, 256)))


# ------------------------------------------------------------- PII scrubbing
#: ordered (class, pattern, replacement): email before ip before phone —
#: replacement tags carry no digits, so later numeric patterns can never
#: re-match inside an earlier substitution. Patterns are the RE2 ∩ java.util
#: .regex common subset (no backrefs/lookaround), so Spark (JVM) and the
#: DuckDB oracle (RE2) substitute identically.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?\d[\d ()-]{6,}\d", "<PHONE>"),
]


def pii_scrub(col) -> Column:
    """Redact common PII classes (training-data hygiene pass): chained JVM
    ``regexp_replace`` — whole-stage codegen, no Python. The reference has no
    PII pass (out of its CDC scope); this belongs to the LLM-pipeline
    operator family alongside dedup/decontaminate."""
    c = _c(col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count(col, kind: str) -> Column:
    """Occurrences of one PII class, counted at the same stage of the scrub
    chain where ``pii_scrub`` would replace it (so email digits never double-
    count as phones)."""
    c = _c(col)
    for name, pat, repl in PII_PATTERNS:
        if name == kind:
            return F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, repl)
    raise KeyError(kind)


def pii_scrub_sql(col: str) -> str:
    """pii_scrub as DuckDB SQL (regexp_replace needs the explicit 'g')."""
    expr = col
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def pii_count_sql(col: str, kind: str) -> str:
    expr = col
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        if name == kind:
            return f"len(regexp_extract_all({expr}, '{p}'))"
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    raise KeyError(kind)


# ------------------------------------------------- repetition (Gopher-style)
def repetition_ratio(col, k: int = 3) -> Column:
    """Duplicate-k-gram fraction: 1 − distinct/total word k-grams — the
    Gopher/MassiveText repetition filter signal (high ratio = looping or
    boilerplate text). Built-ins only: one linear zip-shift shingle pass +
    array_distinct; same clamped short-doc semantics as ``fingerprint``."""
    g = word_shingles(col, k)
    n = F.size(g).cast("double")
    return (F.lit(1.0)
            - F.size(F.array_distinct(g)).cast("double") / F.greatest(n, F.lit(1.0)))


def repetition_ratio_sql(col: str, k: int = 3) -> str:
    """repetition_ratio as DuckDB SQL (same clamped-slice shingles as the
    fingerprint oracle)."""
    t = f"regexp_extract_all(trim(lower({col})), '\\S+')"
    g = (f"list_transform(generate_series(1, greatest(len({t}) - {k - 1}, 1)), "
         f"i -> array_to_string({t}[i:i+{k - 1}], ' '))")
    return (f"(1.0 - cast(len(list_distinct({g})) as double) "
            f"/ greatest(cast(len({g}) as double), 1.0))")
