"""Driver-side ingestion utilities (SURVEY.md §2.1 S1-S3).

Reference: /root/reference/src/ingestion/download_wiki.py. These are plain
Python pre-steps, not Spark jobs — fetching a dump is inherently a single
HTTP stream. S2 (bz2 decompress) exists for API parity but is normally
unnecessary: Spark's text/XML readers decode ``.bz2`` through Hadoop codecs.

stdlib-only (urllib) — the reference used ``requests``, which is not
available in this container.
"""

from __future__ import annotations

import bz2
import logging
import os
import shutil
import urllib.request

logger = logging.getLogger(__name__)

# S3 dump resolver table (download_wiki.py:22-25)
WIKI_DUMPS = {
    "simplewiki": "https://dumps.wikimedia.org/simplewiki/latest/simplewiki-latest-pages-articles.xml.bz2",
    "enwiki": "https://dumps.wikimedia.org/enwiki/latest/enwiki-latest-pages-articles.xml.bz2",
}


def download_file(url: str, output_path: str, chunk_size: int = 8192) -> str:
    """S1: stream a URL to disk (download_wiki.py:28-81)."""
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    logger.info("downloading %s -> %s", url, output_path)
    with urllib.request.urlopen(url) as resp, open(output_path, "wb") as out:
        shutil.copyfileobj(resp, out, length=chunk_size)
    return output_path


def decompress_bz2(input_path: str, output_path: str | None = None) -> str:
    """S2: .bz2 → plain file (download_wiki.py:84-141). Prefer letting Spark
    read the .bz2 directly; kept for API parity."""
    if output_path is None:
        output_path = input_path.removesuffix(".bz2")
    with bz2.open(input_path, "rb") as src, open(output_path, "wb") as dst:
        shutil.copyfileobj(src, dst)
    return output_path


def download_wikipedia(source: str = "simplewiki", output_dir: str = "data/raw") -> str:
    """S3: resolve a named dump (or literal URL) and download it
    (download_wiki.py:144-188)."""
    url = WIKI_DUMPS.get(source, source)
    if not url.startswith(("http://", "https://")):
        raise ValueError(f"unknown source {source!r}; known: {sorted(WIKI_DUMPS)}")
    filename = url.rsplit("/", 1)[-1]
    return download_file(url, os.path.join(output_dir, filename))
