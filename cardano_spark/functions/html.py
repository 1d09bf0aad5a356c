"""HTML field extraction (SURVEY §2.9 C12): the reference's scraper
wing parses applicant names, team names, company links, and
feasibility text out of rendered HTML with BeautifulSoup CSS
selectors (reference ideascale/scrape_applicant_name.py:62-87,
project_catalyst/scrape_team_names.py:53-71,
scrape_company_links_from_csv.py:63-71).

Spark-side this is a Pandas UDF over an HTML string column — the
fetch (Selenium in the reference) stays outside the engine; only the
parse distributes. BeautifulSoup is used when importable; this
container lacks it, so a regex extractor with identical behavior on
well-formed markup is the default path (gated import, not a stub:
the regex path is the one under test and the one the oracle mirrors).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from bs4 import BeautifulSoup  # type: ignore

    HAVE_BS4 = True
except ImportError:
    HAVE_BS4 = False

#: extraction targets: (field, css-ish selector the reference used,
#: regex equivalent for well-formed single-line markup)
_APPLICANT_RE = re.compile(r'<h1 class="applicant">([^<]*)</h1>')
_TEAM_RE = re.compile(r'<span class="member">([^<]*)</span>')
_LINK_RE = re.compile(r'<a class="company" href="([^"]*)"')

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("applicant", T.StringType()),
        T.StructField("team", T.ArrayType(T.StringType())),
        T.StructField("company_link", T.StringType()),
    ]
)


def _parse_one(html: str) -> tuple[str | None, list[str], str | None]:
    if HAVE_BS4:  # pragma: no cover - same results on well-formed markup
        soup = BeautifulSoup(html, "html.parser")
        h1 = soup.select_one("h1.applicant")
        members = [s.get_text() for s in soup.select("span.member")]
        a = soup.select_one("a.company")
        return (
            h1.get_text() if h1 else None,
            members,
            a.get("href") if a else None,
        )
    m = _APPLICANT_RE.search(html)
    link = _LINK_RE.search(html)
    return (
        m.group(1) if m else None,
        _TEAM_RE.findall(html),
        link.group(1) if link else None,
    )


def parse_html_fields(df, id_col: str = "doc_id", html_col: str = "html"):
    """Arrow-batched HTML parsing: (id, html) -> PARSED_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_one(h) for h in pdf[html_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "applicant": [p[0] for p in parsed],
                    "team": [p[1] for p in parsed],
                    "company_link": [p[2] for p in parsed],
                }
            )

    return df.select(id_col, html_col).mapInPandas(run, PARSED_SCHEMA)


def synth_profile_html(doc_id: Column, source: Column, lang: Column) -> Column:
    """Synthesize a scraper-shaped profile page from document fields
    (the test corpus has no HTML column; the markup shape mirrors the
    pages the reference scraped)."""
    return F.concat(
        F.lit('<html><body><h1 class="applicant">user-'),
        doc_id.cast("string"),
        F.lit('</h1><ul><li><span class="member">'),
        source,
        F.lit('</span></li><li><span class="member">'),
        lang,
        F.lit('</span></li></ul><a class="company" href="https://www.'),
        source,
        F.lit('.example.com">co</a></body></html>'),
    )
