"""Text analysis for training-data pipelines.

Language-ID (stopword/n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting (order-aware rolling
hash). All pure Column expressions; every formula is mirrored 1:1 in the
DuckDB oracle SQL (same md5-based hash, same stopword lists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
# Deliberately short (they get embedded into oracle SQL literals too).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is", "in", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

# BPE-ish pre-tokenizer: word pieces or single non-space symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

EN_STOPWORDS = LANG_MARKERS["en"]


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via regexp extraction (word pieces + symbols)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_REGEX), F.lit(0)))


def tokenize_ids(text: Column, vocab: int = 32768) -> Column:
    """Deterministic token-id array: md5-hash each whitespace token into a
    fixed vocab — produces the north-rule input shape (tokens:array<int>)
    from raw text, bit-identically reproducible in the DuckDB oracle."""
    return F.transform(ws_tokens(text), lambda t: (md5_long(t) % vocab).cast("int"))


def _contains_any(marker_arr: Column):
    # factory, not a 2-param lambda: PySpark HOFs pass the element index to
    # any 2-parameter callable (default args count as parameters)
    return lambda t: F.array_contains(marker_arr, t)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker hit counts over whitespace tokens."""
    toks = ws_tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, _contains_any(marker_arr)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by marker hits; 'und' (undetermined) when all zero.

    Ties break by fixed language order (en, de, fr, es) — deterministic and
    reproducible in SQL as a CASE chain.
    """
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in ("es", "fr", "de", "en"):  # reverse priority; later wins ties via >=
        s = scores[lang]
        cond = s > 0
        best = F.when(cond & (s >= best_score), F.lit(lang)).otherwise(best)
        best_score = F.when(cond & (s >= best_score), s).otherwise(best_score)
    return best


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    toks = ws_tokens(text)
    n = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0)))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_word_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n,
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
    }


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: rewards stopword presence and sane word
    lengths, penalizes punctuation soup. A heuristic, not a model."""
    q = quality_features(text)
    len_ok = F.when((q["mean_word_len"] >= 2.0) & (q["mean_word_len"] <= 12.0), 1.0).otherwise(0.3)
    stop_ok = F.least(q["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - q["punct_ratio"] * 5.0)
    return (len_ok * 0.3 + stop_ok * 0.4 + punct_pen * 0.3).cast("double")


def norm_text(text: Column) -> Column:
    """CCNet-style dedup-key normalization (Wenzek et al. 2020 §4.1
    normalizes case/punctuation before paragraph hashing): lowercase,
    non-alphanumerics → space, whitespace runs collapsed, trimmed.

    Byte-exact dedup misses trivially reformatted duplicates (case,
    punctuation, spacing churn from scrapes of the same page); hashing
    ``norm_text`` instead catches them. Pure Column work (three regexp
    passes), ASCII character classes so Java regex and RE2 (the DuckDB
    oracle) agree byte-for-byte.
    """
    t = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


MOD_P = 1_000_000_007


def fingerprint(text: Column) -> Column:
    """Order-aware document fingerprint: sum of h(pos#token) mod p.

    Rolling-hash-equivalent (position-mixed), expressible identically in
    DuckDB via generate_subscripts + the shared md5 hash.
    """
    toks = ws_tokens(text)
    hashed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: md5_long(F.concat(i.cast("string"), F.lit("#"), t)) % MOD_P,
    )
    total = F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, h: (acc + h) % MOD_P)
    return F.when(F.size(toks) > 0, total).otherwise(F.lit(0).cast("long"))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per document: all text-analysis features.

    Scale shape: the Column helpers above inline the tokenization into every
    feature (lang scores ×4 + stopwords + fingerprint + counts -> huge
    codegen, re-evaluated token arrays). Here tokens are exploded ONCE and
    every token-derived feature is a map-side-combined aggregate; char-level
    features stay single-use expressions on the original rows. One narrow
    explode + one groupBy shuffle of a dozen numeric partials per doc.
    Formulas are identical to the Column helpers (and the DuckDB oracle).
    """
    t = F.col(text_col)
    chars = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))).alias("__n_punct"),
        token_count_bpe(t).alias("n_tokens_bpe"),
    )

    # posexplode_outer + isNotNull(pos) == posexplode for ANY array, and
    # skips the inferred generate filter's scan-side re-evaluation
    toks = df.select(
        F.col(id_col), F.posexplode_outer(ws_tokens(t)).alias("__pos", "__t")
    ).where(F.col("__pos").isNotNull())
    lang_aggs = [
        F.sum(F.when(F.col("__t").isin(LANG_MARKERS[lang]), 1).otherwise(0)).alias(
            f"__s_{lang}"
        )
        for lang in LANG_MARKERS
    ]
    fp_term = md5_long(
        F.concat((F.col("__pos") + 1).cast("string"), F.lit("#"), F.col("__t"))
    ) % MOD_P
    agg = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_words"),
        F.sum(F.length("__t")).alias("__sum_len"),
        F.sum(F.when(F.col("__t").isin(EN_STOPWORDS), 1).otherwise(0)).alias("__n_stop"),
        (F.sum(fp_term) % MOD_P).alias("__fp"),
        *lang_aggs,
    )

    j = chars.join(agg, id_col, "left")
    n = F.coalesce(F.col("__n_words"), F.lit(0))
    s = {lang: F.coalesce(F.col(f"__s_{lang}"), F.lit(0)) for lang in LANG_MARKERS}
    # argmax with earlier-language tie wins — same CASE chain as the oracle
    lang_pred = (
        F.when((s["en"] > 0) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] > 0) & (s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when((s["fr"] > 0) & (s["fr"] >= s["es"]), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )
    punct_ratio = F.when(
        F.col("n_chars") > 0, F.col("__n_punct").cast("double") / F.col("n_chars")
    ).otherwise(F.lit(0.0))
    stopword_ratio = F.when(
        n > 0, F.coalesce(F.col("__n_stop"), F.lit(0)).cast("double") / n
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n > 0, F.coalesce(F.col("__sum_len"), F.lit(0)).cast("double") / n
    ).otherwise(F.lit(0.0))
    len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.3)
    stop_ok = F.least(stopword_ratio * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    quality = (len_ok * 0.3 + stop_ok * 0.4 + punct_pen * 0.3).cast("double")

    return j.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens_ws"),
        F.col("n_tokens_bpe"),
        lang_pred.alias("lang_pred"),
        F.col("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality"),
        F.coalesce(F.col("__fp"), F.lit(0)).cast("long").alias("fingerprint"),
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Ordered (non-distinct) word n-grams; empty when the doc is shorter
    than ``n``. Shifted-slice ``zip_with`` construction — O(tokens·n)/row,
    same shape as ``dedup.word_shingles`` but keeping duplicates and order
    (repetition statistics need the counts shingles throw away)."""
    size = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(size - k, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(grams, lambda x: x.isNotNull())


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals (token level).

    Per document: ``top_tok_frac`` (share of tokens taken by the most
    frequent token), ``top_2gram_frac`` (share of tokens covered by the
    most frequent 2-gram), ``dup_3gram_frac`` (share of 3-gram positions
    whose gram occurs more than once). The standard pre-training quality
    gates for boilerplate / template spam (Gopher §A.1.1 repetition
    filters, re-expressed over whitespace tokens).

    Scale shape: ONE corpus scan and ONE shuffled frame for all three gram
    sizes — the 1/2/3-grams are built per row as a single tagged array
    (struct(n, gram), the quality_gate idiom) and exploded once into
    (doc, n, gram_hash) rows, counted with a map-side-combined groupBy,
    then pivoted per doc with conditional aggregates. Two exchanges total,
    zero joins, and the shuffle payload is a 60-bit gram hash (8 bytes),
    never the gram strings. The hash is the DuckDB-parity md5, so the
    (negligible) collision behavior is identical in the oracle.
    (A unionByName of three per-n explodes computes the same rows but
    re-scans the corpus per gram size — the fused form reads it once.)
    """
    toks = ws_tokens(F.col(text_col))

    def _tagged(n: int):
        return F.transform(
            word_ngrams(toks, n),
            lambda g: F.struct(F.lit(n).alias("gn"), g.alias("g")),
        )

    # explode_outer + isNotNull(x): avoids the inferred generate filter
    # re-evaluating the tagged-gram expression at the scan (see
    # dedup.minhash_signatures); struct elements are never NULL.
    allgrams = df.select(
        F.col(id_col),
        F.explode_outer(F.concat(_tagged(1), _tagged(2), _tagged(3))).alias("x"),
    ).where(F.col("x").isNotNull()).select(
        id_col, F.col("x.gn").alias("n"), md5_long(F.col("x.g")).alias("gh")
    )
    cnt = allgrams.groupBy(id_col, "n", "gh").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c")
    of = lambda n: F.when(F.col("n") == n, c)
    prof = cnt.groupBy(id_col).agg(
        F.max(of(1)).alias("t1_max"),
        F.sum(of(1)).alias("t1_total"),
        F.max(of(2)).alias("t2_max"),
        F.sum(F.when((F.col("n") == 3) & (c > 1), c)).alias("t3_dup"),
        F.sum(of(3)).alias("t3_total"),
    )
    n_tok = F.col("t1_total")
    frac = lambda num, den: F.round(
        F.coalesce(num.cast("double") / den, F.lit(0.0)), 4
    )
    return prof.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tok"),
        frac(F.col("t1_max"), n_tok).alias("top_tok_frac"),
        frac(F.col("t2_max") * 2, n_tok).alias("top_2gram_frac"),
        frac(F.col("t3_dup"), F.col("t3_total")).alias("dup_3gram_frac"),
    )


def entropy_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon-entropy quality signals (char + token level).

    The classic junk detectors the ratio-based gates miss: base64/hex blobs
    and minified code sit at near-maximal ``char_entropy`` with normal word
    lengths; "the the the ..." template spam and keyword-stuffed SEO pages
    crater ``token_entropy`` long before ``top_tok_frac`` trips. Both are
    standard pre-training heuristics (e.g. CCNet/RefinedWeb-style "natural
    text" screens) alongside the Gopher ratios in ``repetition_profile``.

    Columns: ``n_chars_nws`` (non-whitespace chars), ``char_entropy``
    (bits/char), ``n_tok``, ``token_entropy`` (bits/token),
    ``distinct_token_ratio`` — entropies rounded to 4 digits, computed as
    H = (ln N - Σ c·g(c) / (N·1e4)) / ln 2 with g(c) = round(ln(c)·1e4)
    summed as exact BIGINTs, so the accumulation is order-independent and
    bit-identical in the DuckDB oracle (the lm.py scaled-integer-grid
    idiom — a double Σ c·ln c would hash-diverge on summation order).
    Char splitting is per code unit (Spark) / UTF-8 char (DuckDB): they
    agree on the BMP; astral-plane text shifts char_entropy slightly
    between engines (entropy is a screen, not an identity — acceptable).

    Scale shape: ONE corpus scan — chars and tokens are built per row as a
    single tagged array (struct(gn, unit), the repetition_profile idiom)
    and exploded once into (doc, gn, 60-bit unit hash) longs, counted with
    a map-side-combined groupBy, reduced per (doc, gn), pivoted per doc
    with conditional aggregates, and left-joined back to the id spine so
    empty docs report zeros. Two exchanges, shuffle payload is 8-byte
    hashes, never the units themselves.
    """
    t = F.col(text_col)
    chars = F.filter(
        F.split(F.regexp_replace(F.lower(t), r"\s+", ""), ""),
        lambda c: c != "",
    )
    tagged = F.concat(
        F.transform(chars, lambda c: F.struct(F.lit(0).alias("gn"), c.alias("u"))),
        F.transform(
            ws_tokens(t), lambda x: F.struct(F.lit(1).alias("gn"), x.alias("u"))
        ),
    )
    # explode_outer + isNotNull(x): see the allgrams note above
    rows = df.select(F.col(id_col), F.explode_outer(tagged).alias("x")).where(
        F.col("x").isNotNull()
    ).select(id_col, F.col("x.gn").alias("gn"), md5_long(F.col("x.u")).alias("uh"))
    cnt = rows.groupBy(id_col, "gn", "uh").agg(F.count(F.lit(1)).alias("c"))
    g = F.round(F.log(F.col("c").cast("double")) * 10000.0).cast("long")
    per = cnt.groupBy(id_col, "gn").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * g).alias("s"),
        F.count(F.lit(1)).alias("d"),
    )
    # d == 1 (all units identical) is EXACTLY zero entropy; the 1e-4 grid
    # would otherwise report ±1e-4 noise there. Clamp the rest at 0 — the
    # grid can dip a few micro-bits negative on near-degenerate counts.
    ent = F.when(F.col("d") == 1, F.lit(0.0)).otherwise(
        F.greatest(
            F.lit(0.0),
            F.round(
                (
                    F.log(F.col("n").cast("double"))
                    - F.col("s").cast("double")
                    / (F.col("n").cast("double") * 10000.0)
                )
                / F.log(F.lit(2.0)),
                4,
            ),
        )
    )
    scored = per.select(id_col, "gn", "n", "d", ent.alias("h"))
    of = lambda gn, c: F.max(F.when(F.col("gn") == gn, F.col(c)))
    prof = scored.groupBy(id_col).agg(
        of(0, "n").alias("__nc"),
        of(0, "h").alias("__hc"),
        of(1, "n").alias("__nt"),
        of(1, "h").alias("__ht"),
        of(1, "d").alias("__dt"),
    )
    out = df.select(F.col(id_col)).join(prof, id_col, "left")
    nt = F.coalesce(F.col("__nt"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("__nc"), F.lit(0)).cast("long").alias("n_chars_nws"),
        F.coalesce(F.col("__hc"), F.lit(0.0)).alias("char_entropy"),
        nt.alias("n_tok"),
        F.coalesce(F.col("__ht"), F.lit(0.0)).alias("token_entropy"),
        F.when(
            nt > 0,
            F.round(F.col("__dt").cast("double") / nt.cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("distinct_token_ratio"),
    )


# Single-pass entity decode: '&amp;' LAST so '&amp;lt;' -> '&lt;' (literal
# text, not a tag) — the order every spec-shaped decoder uses.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(text: Column) -> Column:
    """Markup removal for web-crawl text (the C4/CCNet preprocessing leg):
    drops <script>/<style> blocks and comments wholesale, strips remaining
    tags, decodes the six universal entities, collapses whitespace.

    Pure Column expression — narrow, no shuffle, whole-stage codegen'd; the
    regexes avoid backreferences so the DuckDB RE2 oracle mirror
    (``oracle.strip_html_expr``) is the literally-identical pattern set.
    Regex-based (not a parser): right for bulk crawl cleanup, not for
    adversarial HTML.
    """
    c = F.regexp_replace(text, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# Deterministic HTML synthesis shared by the strip_html demo query and its
# DuckDB oracle (oracle.demo_html_sql imports these literals): wraps each
# document in markup exercising every strip stage — a script with a bare
# '<', a style block, a comment, inline tags, and all six entities.
HTML_PRE = '<html><body data-id="'
HTML_MID1 = '"><h1>Doc '
HTML_MID2 = (
    '</h1><script type="text/javascript">var x = 1 < 2; // &amp;</script>'
    "<style>p { color: red; }</style><!-- hidden --><p>"
)
HTML_MID3 = "</p><div>&amp; &lt;"
HTML_POST = "&gt;&nbsp;&quot;end&quot;&#39;q&#39;</div></body></html>"


def demo_html(id_col: Column, text_col: Column, source_col: Column) -> Column:
    """Byte-identical in Spark and DuckDB (same literals, same casts)."""
    return F.concat(
        F.lit(HTML_PRE),
        id_col.cast("string"),
        F.lit(HTML_MID1),
        id_col.cast("string"),
        F.lit(HTML_MID2),
        F.replace(text_col, F.lit("the "), F.lit("<b>the</b> ")),
        F.lit(HTML_MID3),
        source_col,
        F.lit(HTML_POST),
    )


# ------------------------------------------------------------------ URLs
#
# RefinedWeb-style URL curation (Penedo et al. 2023 §3.1): crawl pipelines
# key dedup, per-domain caps, and blocklists on a NORMALIZED url + a
# registered-domain grouping key. Pure Column regexps (RE2-safe: no
# backrefs, no lookarounds) mirrored 1:1 in the DuckDB oracle.

# tracking params dropped by url_normalize: the universal click-id noise
# that makes one page count as many
URL_TRACKING_RE = r"^(fbclid|gclid|msclkid)="


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose an absolute URL: scheme, host (lowercased), port, path,
    query, fragment, and ``domain`` — the registered domain approximated as
    the last two dot-labels (a heuristic, not the Public Suffix List;
    co.uk-style suffixes group one level too coarse, documented)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1
    )
    host = F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1))
    return {
        "scheme": scheme,
        "host": host,
        "port": F.regexp_extract(hostport, r":([0-9]+)$", 1),
        "path": F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        "query": F.regexp_extract(url, r"\?([^#]*)", 1),
        "fragment": F.regexp_extract(url, r"#(.*)$", 1),
        "domain": F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    }


def url_normalize(url: Column) -> Column:
    """Canonical URL for dedup/caps: lowercase scheme+host, strip leading
    'www.', drop default ports (http:80 / https:443), collapse trailing
    path slashes (root stays '/'), drop utm_*/click-id tracking params and
    the fragment, keep the remaining query verbatim (order preserved —
    reordering would conflate distinct server semantics). Non-absolute
    inputs (no scheme) pass through trimmed, never mangled."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    port = F.when(
        (p["port"] == "")
        | ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    p1 = F.regexp_replace(p["path"], r"/+$", "")
    path = F.when(p1 == "", F.lit("/")).otherwise(p1)
    q2 = F.array_join(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != "")
            & (kv.substr(1, 4) != "utm_")
            & ~kv.rlike(URL_TRACKING_RE),
        ),
        "&",
    )
    query = F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2))
    norm = F.concat(p["scheme"], F.lit("://"), host, port, path, query)
    return F.when(p["scheme"] == "", F.trim(url)).otherwise(norm)


# Deterministic URL synthesis shared by the url_profile demo query and its
# DuckDB oracle: exercises every normalization stage (uppercase scheme/www
# host, default port, trailing slash, tracking params, fragment).
def demo_url(id_col: Column, source_col: Column) -> Column:
    i = id_col.cast("string")
    return F.concat(
        F.lit("HTTPS://WWW."),
        source_col,
        (id_col % 7).cast("string"),
        F.lit(".Example.COM:443/Path/"),
        i,
        F.when(id_col % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="),
        (id_col % 5).cast("string"),
        F.lit("&utm_medium=x"),
        F.when(id_col % 2 == 0, F.lit("&ref=home")).otherwise(F.lit("")),
        F.lit("#frag"),
    )


# US unit separator (0x1f): never occurs in text; the sentence-split marker
_SENT_SEP = chr(31)


def sentences(text: Column) -> Column:
    """Sentence segmentation by terminal punctuation ([.!?] + whitespace).

    Lookbehind-free by design (RE2, the DuckDB oracle's engine, has no
    lookaround): inject a unit separator after the terminator, then split —
    both engines run the literally-same pattern. Regex segmentation, not a
    model: right for bulk chunking, wrong for 'Dr. Smith' abbreviations.
    """
    return F.split(
        F.regexp_replace(text, r"([.!?])\s+", "$1" + _SENT_SEP), _SENT_SEP
    )
