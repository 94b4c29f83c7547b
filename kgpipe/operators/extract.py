"""Stage 1 — extract: html (binary) → text (string).

A pure, versioned function of the html bytes only (no network, no
clock, no randomness), so extracted text is byte-identical per url
across runs and across parallelism levels — the per-row invariant
required of the pipeline (BASELINE.json input_hint; SURVEY.md §7 M3).

The reference has no extraction stage (ntto reads N-Triples files
directly); this generalizes its line source
(/root/reference/cmd/ntto/ntto.go:162-197) to web pages whose NT
payload is embedded in markup.

Semantics (EXTRACT_VERSION pins them — bump on any change):
  - decode UTF-8 with errors='replace'
  - drop <script>/<style> subtree text
  - every text node is stripped of surrounding whitespace; empty
    nodes are dropped; surviving chunks are joined with '\\n'
    (so a <pre> block of NT lines keeps its internal newlines)
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
import pyarrow  # noqa: F401  (assert Arrow path available)

EXTRACT_VERSION = 1

_SKIP_TAGS = {"script", "style"}


class _TextCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        chunk = data.strip()
        if chunk:
            self.chunks.append(chunk)


def extract_text(html: bytes | None) -> str:
    """Scalar extractor; ground truth for the vectorized form."""
    if html is None:
        return ""
    parser = _TextCollector()
    parser.feed(html.decode("utf-8", errors="replace"))
    parser.close()
    return "\n".join(parser.chunks)


def extract_text_frame(html: pd.Series) -> pd.Series:
    """Batch form used inside the Spark stage. HTML parsing is
    inherently per-document (stateful tokenizer), so this is a tight
    map over the Arrow batch — the batching amortizes serde, which is
    where row-at-a-time UDFs lose (SURVEY.md §4.1 'lesson')."""
    return html.map(extract_text).astype("object")


def with_extracted_text(pages_df):
    """Spark lift: pages(url, warc_ts, html, text, lang) → same with
    `text` filled. Narrow transform (no shuffle); select pushes
    column pruning into the scan — only url+html cross the Arrow
    boundary when callers project first."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return extract_text_frame(html)

    return pages_df.withColumn("text", _extract(F.col("html")))
