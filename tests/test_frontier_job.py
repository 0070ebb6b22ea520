"""spark-submit drive of jobs/frontier_job.py: discovery parquet in,
politeness-partitioned frontier out, incremental re-run via the
fetched ledger."""

import os
import shutil
import subprocess

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(zipf, argv):
    return subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zipf,
         os.path.join(REPO, "jobs", "frontier_job.py")] + argv,
        capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_frontier_job_end_to_end(tmp_path):
    zipf = shutil.make_archive(
        str(tmp_path / "pkg"), "zip", REPO, "hquery_php_spark"
    )
    seeds = tmp_path / "seeds.parquet"
    pd.DataFrame({"url": [f"https://h{i % 3}.com/seed{i}" for i in range(9)]}).to_parquet(seeds)
    sitemaps = tmp_path / "sitemaps.parquet"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "xml": [
                "<urlset><url><loc>https://h0.com/sm1</loc>"
                "<priority>0.9</priority>"
                "<image:image><image:loc>https://img.h0.com/a.jpg"
                "</image:loc></image:image></url></urlset>",
                "<urlset><url><loc>https://h1.com/no/sm2</loc></url>"
                "</urlset>",
                # index file: its child sitemap loc must become a
                # frontier candidate (fetched next round), not vanish
                "<sitemapindex><sitemap>"
                "<loc>https://h2.com/child-sitemap.xml</loc>"
                "</sitemap></sitemapindex>",
            ],
        }
    ).to_parquet(sitemaps)
    robots = tmp_path / "robots.parquet"
    pd.DataFrame(
        {
            "host": ["h1.com"],
            "robots_txt": [
                "User-agent: *\nDisallow: /no/\n"
                "Sitemap: https://h1.com/declared.xml\n"
            ],
        }
    ).to_parquet(robots)
    out = tmp_path / "frontier"
    mout = tmp_path / "media_frontier"

    r = _submit(
        zipf,
        ["--output", str(out), "--seeds", str(seeds), "--sitemaps",
         str(sitemaps), "--robots", str(robots), "--host-buckets", "4",
         "--media-output", str(mout)],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # the sitemap's image extension becomes a media fetch queue with
    # the same politeness layout
    mdf = pd.read_parquet(mout)
    assert set(mdf["url"]) == {"https://img.h0.com/a.jpg"}
    assert set(mdf["host"]) == {"img.h0.com"}
    assert list(mdf["fetch_order"]) == [0]
    df = pd.read_parquet(out)
    urls = set(df["url"])
    assert "https://h0.com/sm1" in urls
    assert "https://h1.com/no/sm2" not in urls  # robots-denied
    # the robots-declared Sitemap: URL joins the frontier too
    assert "https://h1.com/declared.xml" in urls
    # sitemapindex children are discovery candidates too
    assert "https://h2.com/child-sitemap.xml" in urls
    # 9 seeds + 1 allowed sitemap url + 1 declared + 1 index child
    assert len(urls) == 12
    # politeness: one bucket per host
    assert (df.groupby("host")["host_bucket"].nunique() == 1).all()

    # incremental re-run: everything already fetched -> empty frontier
    ledger = tmp_path / "ledger.parquet"
    pd.DataFrame({"url": sorted(urls)}).to_parquet(ledger)
    out2 = tmp_path / "frontier2"
    r2 = _submit(
        zipf,
        ["--output", str(out2), "--seeds", str(seeds), "--sitemaps",
         str(sitemaps), "--robots", str(robots),
         "--fetched-ledger", str(ledger), "--host-buckets", "4"],
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    try:
        n2 = len(pd.read_parquet(out2))
    except Exception:  # no data files at all — also an empty frontier
        n2 = 0
    assert n2 == 0
