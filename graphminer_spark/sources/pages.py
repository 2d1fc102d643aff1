"""Deterministic Common-Crawl-style pages table generator.

Schema (the graft's ``input_hint``): ``url string, warc_ts timestamp,
html binary, text string, lang string``. Plays the role of the
reference's bundled toy inputs (``/root/reference/inputs/citeseer``):
a seeded corpus whose induced href graph is known at generation time,
so extraction and graph build have exact oracles.

Generation is pure-functional per page id (seed ⊕ id), so it runs as a
``mapInPandas`` over ``spark.range`` — embarrassingly parallel,
identical bytes at any parallelism, and scalable to any row count
without driver-side materialization.

Out-degree is Zipf-skewed toward low page ids (``hub_skew``) to
exercise the hub/salting path — web-graph realism per the north rule.
"""

from __future__ import annotations

import datetime
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = ["en", "en", "en", "de", "fr", "es"]
_WORDS = (
    "graph link crawl page rank component label spark shuffle salt "
    "vertex edge triangle web index partition arrow batch column"
).split()


def url_of(i: int) -> str:
    return f"https://site{i % 97}.example/p{i}"


def _page_record(i: int, n_pages: int, seed: int, hub_skew: float, max_links: int):
    rng = random.Random((seed << 32) ^ i)
    n_links = rng.randint(0, max_links)
    # skew targets toward low ids → low ids become high in-degree hubs
    targets = sorted(
        {
            int(n_pages * (rng.random() ** hub_skew))
            for _ in range(n_links)
        }
        - {i}
    )
    title = f"Page {i}"
    paras: list[str] = []
    html_paras: list[str] = []
    n_paras = rng.randint(1, 4)
    t_iter = iter(targets)
    for p in range(n_paras):
        words = [rng.choice(_WORDS) for _ in range(rng.randint(5, 12))]
        sentence = " ".join(words)
        t = next(t_iter, None)
        if t is not None:
            anchor = rng.choice(_WORDS)
            paras.append(f"{sentence} {anchor}")
            html_paras.append(
                f'<p>{sentence} <a href="{url_of(t)}">{anchor}</a></p>'
            )
        else:
            paras.append(sentence)
            html_paras.append(f"<p>{sentence}</p>")
    # remaining targets land in a trailing link list (no visible text)
    extra = "".join(f'<a href="{url_of(t)}"></a>' for t in t_iter)
    text = "\n".join(paras)
    html = (
        f"<html><head><title>{title}</title></head><body>"
        f"<h1>{title}</h1>{''.join(html_paras)}{extra}</body></html>"
    )
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
        seconds=(i * 997) % 31_536_000
    )
    return (
        url_of(i),
        ts,
        html.encode("utf-8"),
        text,
        _LANGS[rng.randrange(len(_LANGS))],
    )


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    hub_skew: float = 2.0,
    max_links: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table of ``n_pages`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                _page_record(int(i), n_pages, seed, hub_skew, max_links)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                recs, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    ids = spark.range(n_pages, numPartitions=partitions)
    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
