"""Web-curation operators: URL parsing, normalization, registered-domain
extraction, URL-level dedup and per-domain corpus stats.

Not in the reference (Bistro has no string/URL surface at all — SURVEY.md
§2.5); this is the RefinedWeb/CCNet-style curation stage every web-scale
training pipeline runs before anything else: canonicalize the document
URL, collapse crawl duplicates of the same page, and report corpus
composition per registered domain (the unit per-site caps and blocklists
operate on).

Design rules (same as operators/text.py):

- **Zero Python, zero UDFs** — every step is native Catalyst string/array
  codegen, so parsing a trillion URLs is a map-only stage fused into the
  scan.
- **Bit-reproducible in ANSI SQL** — no regex (dialect drift), no
  ``parse_url`` (JVM ``java.net.URI`` quirks DuckDB can't mirror); only
  literal splits, substr, lower, and array filter/join, each with an
  exact DuckDB twin generated next to it (`*_sql`).
- The test corpus has no URL column, so `synth_url` derives a messy but
  DETERMINISTIC URL from ``doc_id`` (mixed-case scheme/host, optional
  ``www.``/default-port/trailing-slash/``utm_*``/fragment noise, and
  pair-wise collisions after normalization) — the same expression on
  both engines, so the oracle contract is over real parsing work, not a
  constant.

100 TB shape: `with_normalized_urls` is map-only (plan-asserted: no
Exchange). `url_dedup` is ONE shuffle on the normalized URL with
partial-aggregatable min/count (crawl dups of one page collapse
map-side). `domain_stats` adds one more partial-agg shuffle on the
registered domain — output is bounded by the number of domains, never
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Two-level public suffixes the heuristic recognises (a real deployment
# loads the full Mozilla PSL as a broadcast table; the *algorithm* —
# last-2 labels unless the last-2 form a listed suffix, then last-3 —
# is the same).
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au",
)


# ------------------------------------------------------------ synth ----
def synth_url(doc_id: Column | str) -> Column:
    """Deterministic messy URL from an integer id (Spark side).

    Pair property: ids 2m and 2m+1 produce DIFFERENT raw strings that
    normalize to the SAME canonical URL (the noise — case, ``www.``,
    ``:443``, trailing slash, ``utm_*`` params, fragment — depends on
    ``doc_id``; the identity — scheme/host/path/``id`` param — depends
    only on m = doc_id // 2).
    """
    k = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    m = ((k - k % 2) / 2).cast("long")
    scheme = F.when(m % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS"))
    www = F.when(k % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    sub = (
        F.when(m % 3 == 0, F.lit("app"))
        .when(m % 3 == 1, F.lit("CDN"))
        .otherwise(F.lit("www2"))
    )
    tld = F.when(m % 4 == 0, F.lit(".co.UK")).otherwise(F.lit(".com"))
    host = F.concat(www, sub, F.lit(".brand"), (m % 5).cast("string"), tld)
    port = F.when(k % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/doc/"),
        m.cast("string"),
        F.when(k % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    qid = F.concat(F.lit("id="), (m % 11).cast("string"))
    query = F.concat(
        F.lit("?"),
        F.when(
            k % 3 == 0, F.concat(F.lit("utm_source=feed&utm_campaign=x&"), qid)
        ).otherwise(qid),
    )
    frag = F.when(
        k % 2 == 0, F.concat(F.lit("#sec"), (k % 4).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def synth_url_sql(id_expr: str = "doc_id") -> str:
    """The identical deterministic URL as DuckDB SQL."""
    k = f"({id_expr})"
    m = f"CAST(({k} - ({k} % 2)) / 2 AS BIGINT)"
    return f"""(
      (CASE WHEN {m} % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
      || '://'
      || (CASE WHEN {k} % 3 = 0 THEN 'WWW.' ELSE '' END)
      || (CASE WHEN {m} % 3 = 0 THEN 'app'
               WHEN {m} % 3 = 1 THEN 'CDN' ELSE 'www2' END)
      || '.brand' || CAST({m} % 5 AS VARCHAR)
      || (CASE WHEN {m} % 4 = 0 THEN '.co.UK' ELSE '.com' END)
      || (CASE WHEN {k} % 5 = 0 THEN ':443' ELSE '' END)
      || '/doc/' || CAST({m} AS VARCHAR)
      || (CASE WHEN {k} % 7 = 0 THEN '/' ELSE '' END)
      || '?'
      || (CASE WHEN {k} % 3 = 0 THEN 'utm_source=feed&utm_campaign=x&'
               ELSE '' END)
      || 'id=' || CAST({m} % 11 AS VARCHAR)
      || (CASE WHEN {k} % 2 = 0 THEN '#sec' || CAST({k} % 4 AS VARCHAR)
               ELSE '' END)
    )"""


# ------------------------------------------------------------ parse ----
def _parts(url: Column) -> dict[str, Column]:
    """Split a URL into scheme/host/port/path/query parts with literal
    string ops only (no regex classes, no parse_url). Fragment is
    discarded here — normalization always drops it."""
    p0 = F.split(url, "://", 2)
    scheme = F.lower(F.get(p0, 0))
    rest = F.get(p0, 1)
    no_frag = F.get(F.split(rest, "#", 2), 0)
    qsplit = F.split(no_frag, "\\?", 2)
    hostpath = F.get(qsplit, 0)
    query = F.coalesce(F.get(qsplit, 1), F.lit(""))
    hostport = F.get(F.split(hostpath, "/", 2), 0)
    path = F.substr(hostpath, F.length(hostport) + 1)
    host = F.lower(F.get(F.split(hostport, ":", 2), 0))
    port = F.coalesce(F.get(F.split(hostport, ":", 2), 1), F.lit(""))
    return {
        "scheme": scheme, "host": host, "port": port,
        "path": path, "query": query,
    }


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: lowercase scheme+host, strip one leading ``www.``,
    strip the scheme's default port, strip one trailing path slash, drop
    ``utm_*`` query params (order of the survivors preserved), drop the
    fragment. Pure codegen — fused into the scan at any scale."""
    u = F.col(url) if isinstance(url, str) else url
    p = _parts(u)
    host = F.when(
        p["host"].startswith("www."), F.substr(p["host"], F.lit(5))
    ).otherwise(p["host"])
    default = F.when(p["scheme"] == "https", F.lit("443")).otherwise(
        F.when(p["scheme"] == "http", F.lit("80")).otherwise(F.lit(""))
    )
    port = F.when(p["port"] == default, F.lit("")).otherwise(p["port"])
    path = F.when(
        p["path"].endswith("/"),
        F.substring(p["path"], 1, F.length(p["path"]) - 1),
    ).otherwise(p["path"])
    keep = F.filter(
        F.split(p["query"], "&", -1),
        lambda prm: F.substring(prm, 1, 4) != "utm_",
    )
    query = F.array_join(keep, "&")
    return F.concat(
        p["scheme"], F.lit("://"), host,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def normalize_url_sql(url_expr: str) -> str:
    """The identical canonical URL as DuckDB SQL (literal splits only)."""
    u = f"({url_expr})"
    rest = f"string_split({u}, '://')[2]"
    scheme = f"lower(string_split({u}, '://')[1])"
    no_frag = f"string_split({rest}, '#')[1]"
    hostpath = f"string_split({no_frag}, '?')[1]"
    query = f"coalesce(string_split({no_frag}, '?')[2], '')"
    hostport = f"string_split({hostpath}, '/')[1]"
    path = f"substr({hostpath}, length({hostport}) + 1)"
    host_raw = f"lower(string_split({hostport}, ':')[1])"
    port_raw = f"coalesce(string_split({hostport}, ':')[2], '')"
    host = (
        f"CASE WHEN substr({host_raw}, 1, 4) = 'www.' "
        f"THEN substr({host_raw}, 5) ELSE {host_raw} END"
    )
    default = (
        f"CASE WHEN {scheme} = 'https' THEN '443' "
        f"WHEN {scheme} = 'http' THEN '80' ELSE '' END"
    )
    port = f"CASE WHEN {port_raw} = {default} THEN '' ELSE {port_raw} END"
    path_n = (
        f"CASE WHEN {path} LIKE '%/' "
        f"THEN substr({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    query_n = (
        f"array_to_string(list_filter(string_split({query}, '&'), "
        f"prm -> substr(prm, 1, 4) <> 'utm_'), '&')"
    )
    return f"""(
      {scheme} || '://' || ({host})
      || (CASE WHEN ({port}) = '' THEN '' ELSE ':' || ({port}) END)
      || ({path_n})
      || (CASE WHEN ({query_n}) = '' THEN '' ELSE '?' || ({query_n}) END)
    )"""


def registered_domain(url_norm: Column | str) -> Column:
    """Registered (pay-level) domain of a NORMALIZED url: last two host
    labels, or last three when the last two form a listed two-level
    public suffix. The unit per-site quotas/blocklists key on."""
    u = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    host = F.get(F.split(u, "://", 2), 1)
    host = F.get(F.split(host, "\\?", 2), 0)
    host = F.get(F.split(host, "/", 2), 0)
    host = F.get(F.split(host, ":", 2), 0)
    labels = F.split(host, "\\.", -1)
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    return F.when(
        (n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3
    ).otherwise(F.when(n >= 2, last2).otherwise(host))


def registered_domain_sql(url_norm_expr: str) -> str:
    """The identical registered domain as DuckDB SQL."""
    u = f"({url_norm_expr})"
    host = (
        f"string_split(string_split(string_split("
        f"string_split({u}, '://')[2], '?')[1], '/')[1], ':')[1]"
    )
    labels = f"string_split({host}, '.')"
    n = f"len({labels})"
    last2 = f"array_to_string(({labels})[{n} - 1:], '.')"
    last3 = f"array_to_string(({labels})[{n} - 2:], '.')"
    suffixes = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return f"""(
      CASE WHEN {n} >= 3 AND ({last2}) IN ({suffixes}) THEN {last3}
           WHEN {n} >= 2 THEN {last2}
           ELSE {host} END
    )"""


# --------------------------------------------------------- operators ----
def with_normalized_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Map-only canonicalization pass: adds ``url_norm`` and ``domain``.
    If ``url_col`` is absent, derives it deterministically from
    ``id_col`` via synth_url (the test-corpus path)."""
    if url_col not in df.columns:
        df = df.withColumn(url_col, synth_url(id_col))
    norm = normalize_url(url_col)
    return df.withColumn("url_norm", norm).withColumn(
        "domain", registered_domain("url_norm")
    )


def url_dedup(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Collapse crawl duplicates of one canonical URL: keep the lowest
    ``id_col`` (first fetch), count the copies. ONE shuffle on
    ``url_norm``; min/count are partial-aggregatable, so replicated
    pages collapse map-side before the exchange."""
    return df.groupBy("url_norm", "domain").agg(
        F.min(id_col).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def domain_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-registered-domain corpus composition AFTER URL dedup:
    unique pages, raw crawl docs, and duplication ratio. Output is
    domain-bounded (never corpus-sized); both aggs partial."""
    per_url = url_dedup(with_normalized_urls(df, id_col=id_col), id_col)
    return per_url.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("n_copies").alias("n_docs"),
        F.round(
            F.sum("n_copies") / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


def domain_stats_sql(table: str = "documents", id_expr: str = "doc_id") -> str:
    """DuckDB oracle for domain_stats over synth URLs (textbook form:
    normalize → group by url → group by domain)."""
    url = synth_url_sql(id_expr)
    norm = normalize_url_sql("url_raw")
    dom = registered_domain_sql("url_norm")
    return f"""
      WITH raw AS (
        SELECT {id_expr} AS doc_id, {url} AS url_raw FROM {table}),
      norm AS (
        SELECT doc_id, {norm} AS url_norm FROM raw),
      with_dom AS (
        SELECT doc_id, url_norm, {dom} AS domain FROM norm),
      per_url AS (
        SELECT url_norm, domain, min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM with_dom GROUP BY url_norm, domain)
      SELECT domain,
             count(*) AS n_pages,
             CAST(sum(n_copies) AS BIGINT) AS n_docs,
             round(sum(n_copies) / count(*), 6) AS dup_ratio
      FROM per_url GROUP BY domain
    """


def url_normalize_report_sql(
    table: str = "documents", id_expr: str = "doc_id"
) -> str:
    """DuckDB oracle for the map-only normalization query."""
    url = synth_url_sql(id_expr)
    norm = normalize_url_sql("url_raw")
    dom = registered_domain_sql("url_norm")
    return f"""
      WITH raw AS (
        SELECT {id_expr} AS doc_id, {url} AS url_raw FROM {table}),
      norm AS (
        SELECT doc_id, url_raw, {norm} AS url_norm FROM raw)
      SELECT doc_id, url_raw, url_norm, {dom} AS domain FROM norm
    """
