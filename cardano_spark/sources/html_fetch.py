"""Partition-parallel rendered-HTML fetch (SURVEY §2.1 S15).

The reference scrapes IdeaScale with a PER-URL headless Chrome
session in a driver-side asyncio loop: start chromedriver, load the
page, wait for the company-link selector, grab ``page_source``, quit
(/root/reference/ideascale/get_company_link_ideascale.py:13-46,
scrape_idea_details.py). Here the SAME pipeline is Spark-shaped: the
URL frame is distributed and each partition renders its URLs through
an injected ``render: url -> html`` callable — the exact seam
``http_fetch.fetch_json_map`` uses for S1-S4 (tests inject fixtures;
production injects :func:`selenium_renderer`, which reuses one
browser per PARTITION instead of one per URL — the reference's
biggest scraping cost).

The browser itself is not (and should not be) part of the engine:
``selenium`` is import-gated exactly like the streaming state-v2
protobuf runtime — a clear error naming the dependency, pinned in
both regimes by tests. Everything downstream of the fetch is already
covered: C12 field parse (`functions/html.py`, q37) and C10
company-from-URL (`functions/scalars.py`, q35/q17).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cardano_spark.sources.http_fetch import with_retry

SCRAPED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("html", T.StringType()),
    ]
)


def selenium_renderer(
    wait_css: str | None = None, timeout_s: float = 30.0
) -> Callable[[str], str]:
    """The production ``render`` callable: one headless-Chrome session
    reused for every URL the closure sees (per partition — contrast
    the reference's driver-per-URL at
    get_company_link_ideascale.py:30-46). GATED: selenium is not
    shipped in this environment and the engine never hard-requires
    it; the import-try raises a clear error instead of a worker
    crash. ``wait_css`` mirrors the reference's
    ``WebDriverWait(...presence_of_element_located...)`` — a timeout
    proceeds with whatever rendered, exactly like the reference."""
    try:
        from selenium import webdriver
        from selenium.common.exceptions import TimeoutException
        from selenium.webdriver.chrome.options import Options
        from selenium.webdriver.common.by import By
        from selenium.webdriver.support import expected_conditions as EC
        from selenium.webdriver.support.ui import WebDriverWait
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "selenium_renderer requires selenium; inject your own "
            "render callable (url -> html) into scrape_html_map instead"
        ) from e

    driver_box: list = []

    def render(url: str) -> str:  # pragma: no cover - needs a browser
        if not driver_box:
            opts = Options()
            opts.add_argument("--headless")
            driver_box.append(webdriver.Chrome(options=opts))
        driver = driver_box[0]
        driver.get(url)
        if wait_css:
            try:
                WebDriverWait(driver, timeout_s).until(
                    EC.presence_of_element_located((By.CSS_SELECTOR, wait_css))
                )
            except TimeoutException:
                pass  # reference behavior: proceed with available HTML
        return driver.page_source

    return render


def scrape_html_map(
    urls: DataFrame,
    url_col: str,
    render: Callable[[str], str],
    requests_per_second: float | None = None,
    num_partitions: int | None = None,
    tries: int = 5,
) -> DataFrame:
    """For each URL, render the page and return ``(url, html)`` rows.

    Scale contract (same as ``fetch_json_map``): ``num_partitions``
    bounds global browser concurrency (one renderer per partition);
    ``requests_per_second`` caps the PER-PARTITION rate, so the
    aggregate is partitions x rps — size both to what the target site
    tolerates. Retries with the reference's exponential backoff (R2).

    URL hygiene mirrors the reference
    (get_company_link_ideascale.py:21-25): values are stripped;
    null/blank entries yield an empty-html row instead of failing the
    batch, so one bad CSV row never kills a scrape.
    """
    rendered = with_retry(render, tries=tries)
    min_interval = 1.0 / requests_per_second if requests_per_second else 0.0

    if num_partitions:
        urls = urls.repartition(num_partitions, url_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last = 0.0
        for pdf in batches:
            out_urls: list[str] = []
            out_html: list[str] = []
            for raw in pdf[url_col]:
                url = raw.strip() if isinstance(raw, str) else ""
                if not url:
                    out_urls.append("" if not isinstance(raw, str) else url)
                    out_html.append("")
                    continue
                if min_interval:
                    wait = min_interval - (time.monotonic() - last)
                    if wait > 0:
                        time.sleep(wait)
                    last = time.monotonic()
                out_urls.append(url)
                out_html.append(rendered(url))
            yield pd.DataFrame({"url": out_urls, "html": out_html})

    return urls.select(F.col(url_col)).mapInPandas(run, schema=SCRAPED_SCHEMA)


def scrape_company_links(
    urls: DataFrame,
    url_col: str,
    render: Callable[[str], str],
    **kwargs,
) -> DataFrame:
    """The reference's full company-link pipeline, Spark-shaped:
    render each profile page (S15), pull the company link out of the
    HTML (C12 regex — the ``a.company`` href), then normalize it to a
    company name (C10). One fetch pass, everything after it JVM-side
    column expressions."""
    from cardano_spark.functions.html import _LINK_PAT
    from cardano_spark.functions.scalars import company_from_url

    scraped = scrape_html_map(urls, url_col, render, **kwargs)
    link = F.regexp_extract(F.col("html"), _LINK_PAT, 1)
    return scraped.select(
        "url",
        F.nullif(link, F.lit("")).alias("company_link"),
        company_from_url(F.nullif(link, F.lit(""))).alias("company"),
    )
