"""Dependency-file parsing as an Arrow-batched operator.

Parity: reference github/repos.py:296-348 parses requirements.txt /
setup.cfg text per repo in driver Python (PEP 440 Requirement objects).
Here the parse runs inside ``mapInPandas`` — file text arrives as rows,
each Arrow batch is parsed in bulk, and the output is the canonical
(repo_url, lib id/name/specifier/version) rows the REQUIRES edge builder
consumes (modules/github.py).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("repo_url", T.StringType()),
        T.StructField("lib_id", T.StringType()),
        T.StructField("lib_name", T.StringType()),
        T.StructField("specifier", T.StringType()),
        T.StructField("version", T.StringType()),
    ]
)

# requirement line grammar: name [extras] [op version] [; markers] [# comment]
_REQ_RE = re.compile(
    r"^\s*([A-Za-z0-9][A-Za-z0-9._-]*)\s*(\[[^\]]*\])?\s*((?:===|==|>=|<=|~=|!=|>|<)\s*[^;#\s]+)?"
)


def _canonical_name(name: str) -> str:
    """PEP 503 normalization: lowercase, runs of -_. collapse to '-'
    (mirrors the canonicalization the reference gets from packaging)."""
    return re.sub(r"[-_.]+", "-", name).lower()


def parse_requirements_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {k: [] for k in ("repo_url", "lib_id", "lib_name", "specifier", "version")}
        for repo_url, text in zip(pdf["repo_url"], pdf["requirements_text"]):
            for line in (text or "").splitlines():
                line = line.split("#", 1)[0].strip()
                if not line or line.startswith(("-", "git+", "http")):
                    continue
                m = _REQ_RE.match(line)
                if not m or not m.group(1):
                    continue
                name = _canonical_name(m.group(1))
                spec = (m.group(3) or "").replace(" ", "") or None
                # pinned version only for exact pins (reference repos.py:331-340)
                version = spec[2:] if spec and spec.startswith("==") and not spec.startswith("===") else None
                out["repo_url"].append(repo_url)
                out["lib_id"].append(f"{name}|{version}" if version else name)
                out["lib_name"].append(name)
                out["specifier"].append(spec)
                out["version"].append(version)
        yield pd.DataFrame(out)


def parse_requirements(files: DataFrame) -> DataFrame:
    """files(repo_url, requirements_text) -> parsed requirement rows."""
    return files.select("repo_url", "requirements_text").mapInPandas(
        parse_requirements_batch, PARSED_SCHEMA
    )
