"""Text analysis for training-data pipelines — language ID, quality
scoring, token counting, fingerprinting.

No reference analog (the reference processes binary blockchain payloads)
— these are the first-class training-data ops the engine adds.  All the
hot-path scoring is JVM-side regexp/length arithmetic (codegen'd); the
only Python is the BPE-ish regex pre-tokenizer which is also expressible
as a built-in ``regexp_count``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (deterministic heuristic).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "es", "una", "que"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_scores(text: Column) -> Column:
    """struct of per-language marker-hit counts."""
    return F.struct(*[_marker_hits(text, ws).alias(lang) for lang, ws in LANG_MARKERS.items()])


def detect_lang(text: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) if all 0.

    Deterministic tie-break by fixed priority en > de > fr > es (a
    plain CASE chain, so the identical rule is one SQL expression in
    any oracle engine)."""
    s = lang_scores(text)
    en, de, fr, es = s["en"], s["de"], s["fr"], s["es"]
    mx = F.greatest(en, de, fr, es)
    return (
        F.when(mx <= 0, "und")
        .when(en == mx, "en")
        .when(de == mx, "de")
        .when(fr == mx, "fr")
        .otherwise("es")
    )


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count (empty string → 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """GPT-2-style pre-tokenizer piece count via regexp: contiguous
    letters | digits | single non-space symbol (approximates BPE piece
    boundaries without a vocab)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.when(n > 0, F.round(p / n, 6)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    hits = _marker_hits(text, LANG_MARKERS["en"])
    words = whitespace_token_count(text)
    return F.when(words > 0, F.round(hits / words, 6)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + moderate punct +
    nonzero stopword density.  Deterministic arithmetic only."""
    n = F.length(text)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    stop_score = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * punct_pen + F.lit(0.3) * stop_score, 6
    )


def fingerprint_md5(text: Column) -> Column:
    """Exact-content fingerprint (engine-portable)."""
    return F.md5(text)


def normalize_text(text: Column) -> Column:
    """Canonical form for NORMALIZED exact dedup — how production
    exact-dedup actually keys (byte-identity misses trivial variants):
    casefold, collapse every non-alphanumeric run to one space, trim.
    Deliberately ASCII-simple so the regex is portable across engines
    (Java regex and DuckDB RE2 agree; DuckDB needs the 'g' flag —
    kept in lockstep in the oracle)."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def rolling_hash(text: Column, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over character codes, computed JVM-side
    with aggregate over the char array — the document-fingerprint op.
    h = sum(c_i * base^(n-1-i)) mod p, evaluated Horner-style."""
    chars = F.split(text, "")
    return F.aggregate(
        F.filter(chars, lambda c: F.length(c) > 0),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


# -- repetition / diversity quality signals (Gopher/C4-style gates) -----------
#
# All four are pure within-row higher-order expressions — zero shuffle,
# zero Python: the map-side scale path for corpus-wide repetition
# filtering (the groupBy-explode formulation would shuffle words_per_doc
# x corpus; this one ships one double per doc).
#
# HOF lambdas run interpreted (no whole-stage codegen), so per-element
# cost matters: every metric is built from ONE array_sort + linear
# folds over sorted-adjacent pairs — O(n log n) lambda evals vs the
# naive mode formulation (array_distinct + filter-per-distinct-word)
# which is O(n^2) per row and blows up on long documents.  At contract
# scale the wall is dominated by a per-QUERY constant (Catalyst
# compiling/serializing the big expression tree, ~4 s) that amortizes
# to zero over real partitions — measured execution is ~0.3 ms/row.


def _words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: F.length(w) > 0)


def _adjacent_eq(arr: Column) -> Column:
    """For a SORTED array: 1 where element i+1 equals element i."""
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    return F.zip_with(
        F.slice(arr, 1, n1), F.slice(arr, 2, n1), lambda a, b: (a == b).cast("int")
    )


def _dup_frac_sorted(arr: Column) -> Column:
    """1 - distinct/total for any array (sorts, counts equal-adjacent):
    duplicates == number of equal-adjacent pairs in sorted order."""
    dups = F.aggregate(
        _adjacent_eq(F.array_sort(arr)), F.lit(0), lambda acc, x: acc + x
    )
    return F.when(F.size(arr) <= 0, F.lit(0.0)).otherwise(
        F.round(dups.cast("double") / F.size(arr).cast("double"), 6)
    )


def dup_word_frac(text: Column) -> Column:
    """Fraction of word occurrences that repeat an earlier word
    (1 - distinct/total).  High => boilerplate / keyword stuffing."""
    return _dup_frac_sorted(_words(text))


def _2grams(w: Column) -> Column:
    n1 = F.greatest(F.size(w) - 1, F.lit(0))
    return F.zip_with(
        F.slice(w, 1, n1), F.slice(w, 2, n1), lambda a, b: F.concat(a, F.lit(" "), b)
    )


def dup_2gram_frac(text: Column) -> Column:
    """Fraction of duplicate word 2-grams — the classic repeated-phrase
    signal (C4/Gopher use top/dup n-gram character fractions)."""
    return _dup_frac_sorted(_2grams(_words(text)))


def top_word_frac(text: Column) -> Column:
    """Share of the single most frequent word == longest run in sorted
    order: one fold carrying (current_run, max_run)."""
    w = _words(text)
    runs = F.aggregate(
        _adjacent_eq(F.array_sort(w)),
        F.struct(F.lit(1).alias("cur"), F.lit(1).alias("mx")),
        lambda acc, e: F.struct(
            F.when(e == 1, acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["mx"], F.when(e == 1, acc["cur"] + 1).otherwise(F.lit(1))
            ).alias("mx"),
        ),
    )
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        F.round(runs["mx"].cast("double") / F.size(w).cast("double"), 6)
    )


def repetition_gate_cols(
    dup_word: Column, dup_2gram: Column, top_word: Column,
    max_dup_word: float = 0.6, max_dup_2gram: float = 0.2, max_top_word: float = 0.2,
) -> Column:
    """Keep/drop from ALREADY-COMPUTED repetition columns.  Use this
    when the metrics are also being projected: referencing the metric
    columns (instead of recomputing from text) keeps each HOF tree
    evaluated once — CollapseProject refuses to inline a non-cheap
    expression referenced twice, so a two-select plan computes each
    metric a single time."""
    return (
        (dup_word <= max_dup_word)
        & (dup_2gram <= max_dup_2gram)
        & (top_word <= max_top_word)
    )


def repetition_gate(text: Column, max_dup_word: float = 0.6, max_dup_2gram: float = 0.2,
                    max_top_word: float = 0.2) -> Column:
    """Boolean keep/drop combining the three repetition signals with
    Gopher-style default ceilings (standalone-filter form; see
    ``repetition_gate_cols`` when the metrics are projected too)."""
    return repetition_gate_cols(
        dup_word_frac(text), dup_2gram_frac(text), top_word_frac(text),
        max_dup_word, max_dup_2gram, max_top_word,
    )


# -- PII scrubbing (training-data redaction stage) --------------------------
#
# Patterns restricted to syntax whose match semantics are IDENTICAL in
# Java regex (Spark) and RE2 (the DuckDB oracle): character classes,
# bounded repetition, literal escapes — no lookaround, no backrefs.
# Counts come from the ORIGINAL text; scrubbing replaces all matches
# (Spark regexp_replace is global by default; the oracle must pass the
# 'g' flag).  Pure map-side expression work — scales like any scan.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_PHONE = r"\+[0-9][0-9 ]{6,}[0-9]"


def pii_counts(text: Column) -> list[Column]:
    """(n_email, n_ip, n_phone) occurrence counts on the raw text."""
    return [
        F.regexp_count(text, F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(text, F.lit(PII_IPV4)).alias("n_ip"),
        F.regexp_count(text, F.lit(PII_PHONE)).alias("n_phone"),
    ]


def scrub_pii(text: Column) -> Column:
    """Replace every email/IPv4/phone match with a typed placeholder.
    Email first: its local/domain parts may contain digit runs the
    narrower patterns could otherwise bite into."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


# -- hashed bag-of-words quality classifier (FineWeb-Edu / DCLM shape) --------
#
# The standard LLM-curation scoring gate: a linear model over a hashed
# bag-of-words (the "hashing trick"), evaluated ENTIRELY map-side — one
# logit per document, no vocabulary table, no shuffle, no Python.  At
# 100 TB this is a pure scan stage like quality_score above.  The weight
# vector here is a deterministic pseudo-random lattice (a stand-in for
# trained weights — swapping in real ones is a literal-array change);
# what the oracle certifies is the feature hashing + dot-product
# plumbing, which is the part that has to be exactly reproducible
# across engines and reruns.  Reference analog: the per-event scoring
# gate in src/processors/dex_processor.rs:179-223 (score, then cut).
#
# Portability: word buckets use the repo's polynomial char-code hash
# (base 313 mod 2^31-1, the _poly_hash twin) and bucket weights the
# Knuth multiplicative hash ((j+1)*2654435761 mod 2^31)/2^31 - 0.5 —
# every weight is a dyadic rational k/2^31, so the bag sum is EXACT in
# double arithmetic (no summation-order hazard at all); the single
# rounding happens at the final divide, identically on both engines.

_CLS_BASE = 313
_CLS_P31 = 2147483647  # polynomial-hash modulus (2^31 - 1)
_CLS_KNUTH = 2654435761
_CLS_MOD = 2**31


def whitespace_words(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped — THE shared
    tokenizer of the hashed-BoW classifier and BM25 retrieval.  Its
    DuckDB twin is ``list_filter(string_split_regex(lower(text),
    '\\s+'), x -> length(x) > 0)`` in every oracle that replays either
    operator — change both sides in lockstep only."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: F.length(w) > 0)


_cls_words = whitespace_words


def _cls_bucket(word: Column, dim: int) -> Column:
    codes = F.transform(
        F.filter(F.split(word, ""), lambda ch: F.length(ch) > 0),
        lambda ch: F.ascii(ch).cast("long"),
    )
    h = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * _CLS_BASE + x) % F.lit(_CLS_P31),
    )
    return h % F.lit(dim)


def classifier_logit(text: Column, *, dim: int = 256, bias: float = 0.0) -> Column:
    """Mean hashed-BoW weight + bias, rounded to 6 dp (the raw linear
    score a curation pipeline thresholds on).  dim = hashing-trick
    bucket count; collisions are part of the model, as in any hashed
    linear classifier."""
    words = _cls_words(text)
    wts = F.transform(
        words,
        lambda w: (
            ((_cls_bucket(w, dim) + 1) * F.lit(_CLS_KNUTH)) % F.lit(_CLS_MOD)
        ).cast("double")
        / F.lit(float(_CLS_MOD))
        - F.lit(0.5),
    )
    s = F.aggregate(wts, F.lit(0.0), lambda acc, x: acc + x)
    return F.round(
        F.lit(float(bias)) + s / F.greatest(F.size(words), F.lit(1)).cast("double"), 6
    )


def classifier_score(text: Column, *, dim: int = 256, bias: float = 0.0) -> Column:
    """Sigmoid of the (already-rounded) logit, rounded to 6 dp — both
    engines exponentiate the identical double (the lm_score
    exp-of-rounded float-parity convention)."""
    lg = classifier_logit(text, dim=dim, bias=bias)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-lg)), 6)
