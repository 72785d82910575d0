"""CSV dataset loading with graceful fallback to trimmed samples.

Behavioral parity with the reference loaders (``src/data/loaders.py:24-118``):

- books default to ``books.csv``, interactions to ``users.csv``;
- when the default file is missing and no explicit filename was given, fall
  back to ``books_trimmed.csv`` / ``users_trimmed.csv``;
- interactions get stable string/Int64 dtypes for ``parent_asin`` / ``userId``
  / ``timestamp``;
- ``nrows`` limits are applied at read time;
- interactions referencing ASINs absent from the books frame are dropped.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import pandas as pd

from ..utils.logging import get_logger

logger = get_logger("data")

DEFAULT_BOOKS_FILENAME = "books.csv"
DEFAULT_INTERACTIONS_FILENAME = "users.csv"
SAMPLE_BOOKS_FILENAME = "books_trimmed.csv"
SAMPLE_INTERACTIONS_FILENAME = "users_trimmed.csv"


@dataclass(frozen=True)
class DatasetArtifacts:
    """Raw frames as loaded from disk."""

    books: pd.DataFrame
    interactions: pd.DataFrame


def _read_csv(
    path: Path, *, dtype: Optional[dict[str, str]] = None, nrows: Optional[int] = None
) -> pd.DataFrame:
    if not path.exists():
        raise FileNotFoundError(f"Expected CSV at {path} but file was not found.")
    return pd.read_csv(path, dtype=dtype, nrows=nrows)


def load_books(
    data_dir: Path | str, *, filename: str | None = None, limit: Optional[int] = None
) -> pd.DataFrame:
    data_dir = Path(data_dir)
    target = filename or DEFAULT_BOOKS_FILENAME
    try:
        return _read_csv(data_dir / target, nrows=limit)
    except FileNotFoundError:
        if filename is None and (data_dir / SAMPLE_BOOKS_FILENAME).exists():
            logger.warning("Falling back to %s", SAMPLE_BOOKS_FILENAME)
            return _read_csv(data_dir / SAMPLE_BOOKS_FILENAME, nrows=limit)
        raise


def load_interactions(
    data_dir: Path | str, *, filename: str | None = None, limit: Optional[int] = None
) -> pd.DataFrame:
    data_dir = Path(data_dir)
    target = filename or DEFAULT_INTERACTIONS_FILENAME
    dtype = {"parent_asin": "string", "userId": "string", "timestamp": "Int64"}
    try:
        return _read_csv(data_dir / target, dtype=dtype, nrows=limit)
    except FileNotFoundError:
        if filename is None and (data_dir / SAMPLE_INTERACTIONS_FILENAME).exists():
            logger.warning("Falling back to %s", SAMPLE_INTERACTIONS_FILENAME)
            return _read_csv(
                data_dir / SAMPLE_INTERACTIONS_FILENAME, dtype=dtype, nrows=limit
            )
        raise


def load_dataset(
    data_dir: Path | str,
    *,
    books_file: str | None = None,
    interactions_file: str | None = None,
    books_limit: Optional[int] = None,
    interactions_limit: Optional[int] = None,
) -> DatasetArtifacts:
    """Load both frames and drop interactions outside the books subset."""
    books = load_books(data_dir, filename=books_file, limit=books_limit)
    interactions = load_interactions(
        data_dir, filename=interactions_file, limit=interactions_limit
    )

    if not books.empty and "parent_asin" in books and "parent_asin" in interactions:
        valid_asins = set(books["parent_asin"].astype(str))
        before = len(interactions)
        interactions = interactions[
            interactions["parent_asin"].astype(str).isin(valid_asins)
        ].reset_index(drop=True)
        dropped = before - len(interactions)
        if dropped > 0:
            logger.info(
                "Filtered %d interaction rows referencing ASINs outside the books subset.",
                dropped,
            )

    return DatasetArtifacts(books=books, interactions=interactions)
