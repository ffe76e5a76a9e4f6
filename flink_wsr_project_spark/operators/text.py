"""Text analysis operators: language ID, quality, fingerprinting.

Heuristic, dictionary/ratio-based — deterministic and fully
SQL-expressible in both engines (no model weights, no Python in the
row path). The marker-word tables are literals shared between the
Spark and oracle fragments.
"""

from __future__ import annotations

from flink_wsr_project_spark.operators.dedup import h28, toks_expr

# marker words per language; tie order en > es > de > fr is fixed
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "les", "et", "une", "est"),
}


def marker_count_expr(t: str, lang: str, engine: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    if engine == "spark":
        return f"size(filter({t}, x -> x IN ({words})))"
    return f"len(list_filter({t}, x -> x IN ({words})))"


def lang_pick_expr() -> str:
    """Argmax with fixed tie priority — identical text in both engines."""
    return (
        "CASE WHEN en_score >= es_score AND en_score >= de_score AND en_score >= fr_score THEN 'en' "
        "WHEN es_score >= de_score AND es_score >= fr_score THEN 'es' "
        "WHEN de_score >= fr_score THEN 'de' ELSE 'fr' END"
    )


def lang_id_sql(engine: str, source: str = "documents") -> str:
    t = toks_expr("text", engine)
    scores = ",\n       ".join(
        f"{marker_count_expr('t', lang, engine)} AS {lang}_score" for lang in LANG_MARKERS
    )
    return (
        f"WITH tokd AS (SELECT doc_id, lang, {t} AS t FROM {source}),\n"
        f"scored AS (SELECT doc_id, lang,\n       {scores}\n  FROM tokd)\n"
        f"SELECT doc_id, en_score, es_score, de_score, fr_score,\n"
        f"       {lang_pick_expr()} AS predicted_lang,\n"
        f"       CAST(lang = ({lang_pick_expr()}) AS BOOLEAN) AS matches_label\n"
        f"FROM scored"
    )


def fingerprint_sql(engine: str, source: str = "documents") -> str:
    """Content fingerprints: full md5 + min-shingle-hash (a 1-perm
    minhash — the rolling-hash fingerprint analogue)."""
    from flink_wsr_project_spark.operators.dedup import minhash_expr, shingled_cte

    return (
        f"WITH {shingled_cte(engine, source)}\n"
        f"SELECT s.doc_id, md5(d.text) AS content_md5,\n"
        f"       {minhash_expr('s.sh', 0, engine)} AS shingle_fp\n"
        f"FROM shingled s JOIN {source} d ON s.doc_id = d.doc_id"
    )


def passage_tokens_expr(engine: str) -> str:
    """Lowercased alnum tokenization shared by the decontamination /
    boilerplate passage queries AND their streaming twins — one source
    of truth so the batch and stream sides cannot silently diverge."""
    if engine == "spark":
        return "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    return "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


DECON_N = 8  # sliding n-gram length for benchmark decontamination


def gram_hashes_expr(tk: str, n: int, engine: str) -> str:
    """md5 hashes of the sliding n-token grams of a token-array
    expression ``tk`` (empty array for docs shorter than n)."""
    if engine == "spark":
        return (
            f"CASE WHEN size({tk}) < {n} THEN array() "
            f"ELSE transform(sequence(0, size({tk}) - {n}), "
            f"i -> md5(concat_ws(' ', slice({tk}, i + 1, {n})))) END"
        )
    return (
        f"CASE WHEN len({tk}) < {n} THEN [] "
        f"ELSE list_transform(range(len({tk}) - {n} + 1), "
        f"i -> md5(array_to_string({tk}[i + 1 : i + {n}], ' '))) END"
    )
