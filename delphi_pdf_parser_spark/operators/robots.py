"""robots.txt politeness: parse per-host robots files and filter a URL
table by them — the compliance stage every crawl pipeline runs before
fetching (and re-runs before re-publishing a crawl-derived corpus).

Semantics implemented (RFC 9309 / Google REP subset, documented):
user-agent groups (consecutive ``User-agent`` lines share one group;
``*`` is the fallback group), ``Allow``/``Disallow`` path-prefix rules,
``Crawl-delay``, comments and blank-line group breaks. Rule matching is
PREFIX-ONLY — the ``*``/``$`` wildcard extension is out of envelope
(recorded here; a rule containing a wildcard still parses and matches
by its literal-prefix head up to the first ``*``). Precedence is the
standard most-specific-wins: longest matching prefix, Allow on ties;
no matching rule means allowed.

Scale shape: robots files are per-host and tiny — parsing is one
``mapInPandas`` pass over the (host, robots_txt) table; the filter is
one equi-join of the URL table against the rules ON HOST plus a
per-URL window over its few matching rules (never global).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from delphi_pdf_parser_spark.operators.urls import host_of

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("agent", StringType()),
        StructField("rule", StringType()),  # allow | disallow
        StructField("path_prefix", StringType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def _parse_robots(host: str, txt: str) -> list:
    rows = []
    agents: list = []
    group_open = False  # collecting consecutive User-agent lines
    delay: dict = {}
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(val.lower())
            continue
        group_open = False
        if not agents:
            continue  # rule before any User-agent line: ignored
        if key in ("allow", "disallow"):
            # empty Disallow means "allow everything" per the original
            # REP: record nothing (no rule can then block)
            if not val:
                continue
            prefix = val.split("*", 1)[0]  # wildcard envelope: literal head
            for a in agents:
                rows.append((host, a, key, prefix, delay.get(a)))
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            for a in agents:
                delay[a] = d
                # retrofit onto rules already emitted for this group
                rows = [
                    (h, ag, r, p, d if ag == a and h == host else cd)
                    for (h, ag, r, p, cd) in rows
                ]
    return rows


def _robots_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in RULES_SCHEMA.fields]
    for b in batches:
        rows = []
        for host, txt in zip(b["host"], b["robots_txt"]):
            if txt is None:
                continue
            raw = txt if isinstance(txt, str) else bytes(txt).decode(
                "utf-8", "replace"
            )
            try:
                rows.extend(_parse_robots(host, raw))
            except Exception:
                continue
        yield pd.DataFrame(rows, columns=cols)


def parse_robots(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> one row per (host, agent, rule,
    path_prefix, crawl_delay)."""
    df = robots.select(
        F.col(host_col).alias("host"), F.col(txt_col).alias("robots_txt")
    ).filter(F.col(txt_col).isNotNull())
    return df.mapInPandas(_robots_batches, RULES_SCHEMA)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Verdict per URL under the given agent's rule group (with the
    ``*`` group as fallback for hosts that define other agents only):
    (url, allowed, matched_rule, matched_prefix, crawl_delay).

    Longest-prefix-wins, Allow on ties, allowed when nothing matches.
    One equi-join on host + a per-URL window.
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
        F.regexp_extract(
            F.regexp_replace(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""),
            r"^[^/?#]*(.*)$",
            1,
        ).alias("path"),
    ).withColumn(
        "path", F.when(F.col("path") == "", F.lit("/")).otherwise(F.col("path"))
    )
    agent_rules = rules.filter(F.col("agent") == agent.lower())
    if agent.lower() != "*":
        # hosts with no group for this agent fall back to the * group
        hosts_with = agent_rules.select("host").distinct()
        fallback = rules.filter(F.col("agent") == "*").join(
            hosts_with, "host", "left_anti"
        )
        agent_rules = agent_rules.unionByName(fallback)
    cand = u.join(agent_rules, "host", "left").withColumn(
        "m",
        F.col("path_prefix").isNotNull()
        & F.col("path").startswith(F.col("path_prefix")),
    )
    w = Window.partitionBy("url").orderBy(
        F.desc(F.when(F.col("m"), F.length("path_prefix")).otherwise(-1)),
        F.desc(F.when(F.col("m"), F.col("rule") == "allow")),
        F.asc("rule"),
        F.asc("path_prefix"),
    )
    best = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.select(
        "url",
        F.when(F.col("m"), F.col("rule") == "allow")
        .otherwise(F.lit(True))
        .alias("allowed"),
        F.when(F.col("m"), F.col("rule")).alias("matched_rule"),
        F.when(F.col("m"), F.col("path_prefix")).alias("matched_prefix"),
        F.when(F.col("m"), F.col("crawl_delay")).alias("crawl_delay"),
    )


SITEMAP_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
        StructField("kind", StringType()),  # url | sitemap (index entry)
    ]
)

_SM_ENTRY_RE = re.compile(
    rb"<(url|sitemap)\s*>(.*?)</\1\s*>", re.I | re.S
)
_SM_FIELD_RE = re.compile(
    rb"<(loc|lastmod|changefreq|priority)\s*>(.*?)</\1\s*>",
    re.I | re.S,
)


def _parse_sitemap(host: str, xml: bytes) -> list:
    from delphi_pdf_parser_spark.htmlcore import _decode_entities

    rows = []
    for m in _SM_ENTRY_RE.finditer(xml):
        kind = "url" if m.group(1).lower() == b"url" else "sitemap"
        fields = {}
        for f in _SM_FIELD_RE.finditer(m.group(2)):
            fields[f.group(1).lower()] = _decode_entities(
                f.group(2).decode("utf-8", "replace").strip()
            )
        loc = fields.get(b"loc")
        if not loc:
            continue
        pr = None
        if b"priority" in fields:
            try:
                pr = float(fields[b"priority"])
            except ValueError:
                pr = None
        rows.append(
            (
                host,
                loc,
                fields.get(b"lastmod"),
                fields.get(b"changefreq"),
                pr,
                kind,
            )
        )
    return rows


def _sitemap_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in SITEMAP_SCHEMA.fields]
    for b in batches:
        rows = []
        for host, xml in zip(b["host"], b["sitemap_xml"]):
            if xml is None:
                continue
            raw = xml.encode() if isinstance(xml, str) else bytes(xml)
            try:
                rows.extend(_parse_sitemap(host, raw))
            except Exception:
                continue
        yield pd.DataFrame(rows, columns=cols)


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Crawl discovery: ``<urlset>`` entries and ``<sitemapindex>``
    members of per-host sitemap files as (host, loc, lastmod,
    changefreq, priority, kind) — the frontier-seeding input that pairs
    with :func:`parse_robots`. Tolerant tag-pair scan (namespaces and
    attribute noise ignored), entities decoded; one mapInPandas pass.
    """
    df = sitemaps.select(
        F.col(host_col).alias("host"),
        F.col(xml_col).alias("sitemap_xml"),
    ).filter(F.col(xml_col).isNotNull())
    return df.mapInPandas(_sitemap_batches, SITEMAP_SCHEMA)
