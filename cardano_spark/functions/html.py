"""HTML field extraction (SURVEY §2.9 C12): the reference's scraper
wing parses applicant names, team names, company links, and
feasibility text out of rendered HTML with BeautifulSoup CSS
selectors (reference ideascale/scrape_applicant_name.py:62-87,
project_catalyst/scrape_team_names.py:53-71,
scrape_company_links_from_csv.py:63-71,
ideascale/scrape_feasibility_details_async.py:36-54).

Spark-side the fetch (Selenium in the reference) stays outside the
engine; only the parse distributes. The DEFAULT parse path is pure
built-in column expressions (``F.regexp_extract`` /
``F.regexp_extract_all``) — JVM-side, whole-stage-codegen'd, no
Arrow hop, because the extraction targets are simple field grabs.
BeautifulSoup, when importable, provides a real-HTML-robust path
(malformed nesting, attribute reordering) as an Arrow-batched
mapInPandas; this container lacks it, so the regex path is the one
under test and the one the oracle mirrors.

Multi-valued fields (team members) are serialized to a
'|'-joined string — a deterministic scalar — so results survive
hash-based comparison and columnar sinks that dislike nested types.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from bs4 import BeautifulSoup  # type: ignore

    HAVE_BS4 = True
except ImportError:
    HAVE_BS4 = False

#: extraction targets: (field, css-ish selector the reference used,
#: regex equivalent for well-formed single-line markup)
_APPLICANT_PAT = r'<h1 class="applicant">([^<]*)</h1>'
_TEAM_PAT = r'<span class="member">([^<]*)</span>'
_LINK_PAT = r'<a class="company" href="([^"]*)"'
_FEAS_PAT = r'<div class="feasibility">([^<]*)</div>'

_APPLICANT_RE = re.compile(_APPLICANT_PAT)
_TEAM_RE = re.compile(_TEAM_PAT)
_LINK_RE = re.compile(_LINK_PAT)
_FEAS_RE = re.compile(_FEAS_PAT)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("applicant", T.StringType()),
        T.StructField("team", T.StringType()),
        T.StructField("company_link", T.StringType()),
        T.StructField("feasibility", T.StringType()),
    ]
)


def parse_html_fields_native(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Built-in-function parse: (id, html) -> PARSED_SCHEMA columns.

    Pure JVM column expressions — no Python evaluation node in the
    plan (pinned by tests/test_plan_shapes.py). No-match semantics
    match DuckDB: ``regexp_extract`` yields '' and the joined team
    list of zero members is ''.
    """
    h = F.col(html_col)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.regexp_extract(h, _APPLICANT_PAT, 1).alias("applicant"),
        F.concat_ws("|", F.regexp_extract_all(h, F.lit(_TEAM_PAT), F.lit(1))).alias(
            "team"
        ),
        F.regexp_extract(h, _LINK_PAT, 1).alias("company_link"),
        F.regexp_extract(h, _FEAS_PAT, 1).alias("feasibility"),
    )


def _parse_one_bs4(html: str) -> tuple[str, str, str, str]:  # pragma: no cover
    soup = BeautifulSoup(html, "html.parser")
    h1 = soup.select_one("h1.applicant")
    members = [s.get_text() for s in soup.select("span.member")]
    a = soup.select_one("a.company")
    feas = soup.select_one("div.feasibility")
    return (
        h1.get_text() if h1 else "",
        "|".join(members),
        a.get("href") or "" if a else "",
        feas.get_text() if feas else "",
    )


def parse_html_fields_bs4(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:  # pragma: no cover - bs4 absent in this container
    """Arrow-batched BeautifulSoup parse for real-world (malformed)
    HTML. Same output contract as the native path on well-formed
    markup; only reached when bs4 is importable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_one_bs4(h) for h in pdf[html_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "applicant": [p[0] for p in parsed],
                    "team": [p[1] for p in parsed],
                    "company_link": [p[2] for p in parsed],
                    "feasibility": [p[3] for p in parsed],
                }
            )

    return df.select(id_col, html_col).mapInPandas(run, PARSED_SCHEMA)


def parse_html_fields(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Dispatch: built-in regexp path by default; the Pandas-UDF path
    only when BeautifulSoup is actually importable (real scraped
    HTML with broken markup)."""
    if HAVE_BS4:  # pragma: no cover
        return parse_html_fields_bs4(df, id_col, html_col)
    return parse_html_fields_native(df, id_col, html_col)


def synth_profile_html(doc_id: Column, source: Column, lang: Column) -> Column:
    """Synthesize a scraper-shaped profile page from document fields
    (the test corpus has no HTML column; the markup shape mirrors the
    pages the reference scraped, incl. the feasibility details div)."""
    return F.concat(
        F.lit('<html><body><h1 class="applicant">user-'),
        doc_id.cast("string"),
        F.lit('</h1><ul><li><span class="member">'),
        source,
        F.lit('</span></li><li><span class="member">'),
        lang,
        F.lit('</span></li></ul><a class="company" href="https://www.'),
        source,
        F.lit('.example.com">co</a><div class="feasibility">Feasibility: '),
        lang,
        F.lit(" rollout via "),
        source,
        F.lit("</div></body></html>"),
    )
