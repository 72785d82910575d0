"""RetrievalService: userId -> top-K item ASINs over the serving bundle.

The reference's README lists an "inference service" only as future work;
this module provides one over the artifacts the pipeline exports at the end
of training (flat item index + user embedding matrix + raw-ID vocabs).
Search runs on the best available backend: native C++ searcher when built,
numpy otherwise (see ``flat_index.py``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .flat_index import FlatIndex


@dataclass
class RetrievalService:
    index: FlatIndex
    user_embeddings: np.ndarray
    user_ids: list[str]
    item_ids: list[str]
    user_to_idx: dict[str, int]
    similarity: str = "cosine"

    @classmethod
    def from_artifacts(cls, artifacts_dir: Path | str) -> "RetrievalService":
        """Load the bundle written by the training pipeline
        (``items.index`` + ``user_embeddings.npy`` + ``vocab.json``)."""
        artifacts_dir = Path(artifacts_dir)
        index = FlatIndex.load(artifacts_dir / "items.index")
        user_embeddings = np.load(artifacts_dir / "user_embeddings.npy")
        vocab = json.loads((artifacts_dir / "vocab.json").read_text("utf-8"))
        user_ids = list(vocab["user_ids"])
        return cls(
            index=index,
            user_embeddings=np.asarray(user_embeddings, np.float32),
            user_ids=user_ids,
            item_ids=list(vocab["item_ids"]),
            user_to_idx={uid: i for i, uid in enumerate(user_ids)},
            similarity=str(vocab.get("similarity", "cosine")),
        )

    def recommend_for_user(
        self,
        user_id: str,
        k: int = 10,
        *,
        exclude: set[int] | None = None,
        backend: str = "auto",
    ) -> list[tuple[str, float]]:
        """Top-k (asin, score) for a known userId."""
        if user_id not in self.user_to_idx:
            raise KeyError(f"Unknown userId: {user_id}")
        query = self.user_embeddings[self.user_to_idx[user_id]]
        extra = len(exclude) if exclude else 0
        scores, idx = self.index.search(
            query[None, :], min(k + extra, len(self.index)), backend=backend
        )
        out: list[tuple[str, float]] = []
        for item, score in zip(idx[0], scores[0]):
            if exclude and int(item) in exclude:
                continue
            out.append((self.item_ids[int(item)], float(score)))
            if len(out) >= k:
                break
        return out

    def recommend_for_embedding(
        self, embedding: np.ndarray, k: int = 10, *, backend: str = "auto"
    ) -> list[tuple[str, float]]:
        """Top-k for an arbitrary user embedding (cold-start path)."""
        scores, idx = self.index.search(
            np.asarray(embedding, np.float32)[None, :], k, backend=backend
        )
        return [
            (self.item_ids[int(i)], float(s)) for i, s in zip(idx[0], scores[0])
        ]
