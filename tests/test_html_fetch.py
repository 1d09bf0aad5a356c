"""S15 executable seam: the rendered-HTML fetch-map
(sources/html_fetch.py) against an injected fake renderer — the same
fixture pattern the S1-S4 HTTP tests use. The browser itself stays
out of the engine behind the selenium_renderer import gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardano_spark.sources.html_fetch import (
    scrape_company_links,
    scrape_html_map,
    selenium_renderer,
)

PAGES = {
    "https://x.test/a": '<h1 class="applicant">Ada</h1>'
    '<a class="company" href="https://www.acme.example.com/home">acme</a>',
    "https://x.test/b": '<a class="company" href="http://widgetco.io">w</a>',
    "https://x.test/c": "<p>no company link here</p>",
}


def test_scrape_html_map_renders_urls_and_skips_blanks(spark):
    urls = spark.createDataFrame(
        [("https://x.test/a",), ("  https://x.test/b ",), (None,), ("   ",)],
        "url string",
    )
    out = scrape_html_map(urls, "url", render=PAGES.__getitem__)
    got = {r.url: r.html for r in out.collect()}
    # stripped before rendering; null/blank yield empty html, no failure
    assert got["https://x.test/a"] == PAGES["https://x.test/a"]
    assert got["https://x.test/b"] == PAGES["https://x.test/b"]
    assert got[""] == ""


def test_scrape_html_map_retries_flaky_renderer(spark):
    import tempfile, os

    marker_dir = tempfile.mkdtemp()

    def flaky(url: str) -> str:
        # executor-side state: first call per url fails (R2 backoff
        # must retry); a marker file survives across attempts
        mark = os.path.join(marker_dir, url.replace("/", "_"))
        if not os.path.exists(mark):
            open(mark, "w").close()
            raise RuntimeError("transient render failure")
        return PAGES[url]

    urls = spark.createDataFrame([("https://x.test/a",)], "url string").coalesce(1)
    out = scrape_html_map(urls, "url", render=flaky, tries=3)
    assert out.collect()[0].html == PAGES["https://x.test/a"]


def test_scrape_company_links_full_pipeline(spark):
    """S15 fetch -> C12 link extraction -> C10 company normalization,
    the reference's get_company_link_ideascale flow end to end."""
    urls = spark.createDataFrame(
        [(u,) for u in sorted(PAGES)], "url string"
    )
    out = scrape_company_links(urls, "url", render=PAGES.__getitem__)
    got = {r.url: (r.company_link, r.company) for r in out.collect()}
    assert got["https://x.test/a"] == (
        "https://www.acme.example.com/home",
        "acme",
    )
    assert got["https://x.test/b"] == ("http://widgetco.io", "widgetco")
    assert got["https://x.test/c"] == (None, None)
    # the post-fetch stages are JVM column expressions: no second
    # Python hop beyond the fetch itself
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


def test_selenium_renderer_gate():
    """Both regimes pinned (the state-v2 gate pattern): a clear
    ImportError naming the dependency where selenium is absent; a
    callable where it exists."""
    try:
        import selenium  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="selenium"):
            selenium_renderer()
        return
    assert callable(selenium_renderer())


def test_cli_scrape_companies_end_to_end(spark, tmp_path):
    """python -m cardano_spark scrape-companies with an injected fake
    renderer: CSV urls in, company-link CSV out — the reference
    scraper's whole main."""
    import csv
    import glob

    from cardano_spark.__main__ import main

    src = tmp_path / "urls.csv"
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url"])
        for u in sorted(PAGES):
            w.writerow([u])
    dest = str(tmp_path / "out")
    rc = main(
        [
            "scrape-companies",
            "--urls-csv", str(src),
            "--dest", dest,
            "--rps", "0",
            "--partitions", "2",
        ],
        render=PAGES.__getitem__,
    )
    assert rc == 0
    rows = {}
    for part in glob.glob(f"{dest}/*.csv"):
        with open(part, newline="") as f:
            for r in csv.DictReader(f):
                rows[r["url"]] = (r["company_link"], r["company"])
    assert rows["https://x.test/b"] == ("http://widgetco.io", "widgetco")
    assert rows["https://x.test/c"] == ("", "")  # csv writes NULL as ""
