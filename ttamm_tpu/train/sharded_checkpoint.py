"""Multi-host-safe sharded checkpointing.

The single-file ``.npz`` format (``checkpoint.py``) pulls every leaf with
``np.asarray`` — that requires fully-addressable arrays and funnels the
whole state (~7.5 GB at the 2M-item scale) through one host. On a
multi-process mesh each process instead saves exactly the shards it owns:

``<name>/`` (directory; same ``checkpoint_filename`` templating)
    ``manifest.json``        — meta (epoch/metric/timestamp), written by
                               process 0
    ``shards_p00000.npz``    — this process's addressable shards, one entry
                               per (leaf, shard-index) piece

Piece keys are ``<leaf key>::<bounds>`` with bounds ``"r0:r1;c0:c1"`` in
global coordinates (empty for scalars). Only ``replica_id == 0`` shards are
written, so pieces of one leaf are disjoint and their union covers it.

Restore rebuilds each leaf with ``jax.make_array_from_callback`` against
the *template state's* shardings — each process materialises only its
addressable shards, assembled from whatever saved pieces overlap them, so
the checkpoint restores under a different mesh layout (or process count)
than it was saved with, as long as every shard file is visible to every
process (shared filesystem; with purely local disks the mesh layout must
be unchanged so each process reads back its own file).

Sparse-Adam moment layouts are bridged like the ``.npz`` path: ``mv``
pieces are synthesised from ``m``/``v`` pieces (and vice versa) by lane
offsetting, so ``training.packed_moments`` can be toggled across resume.

The reference has no distributed training at all (SURVEY §2.3); its
checkpointing is single-process ``torch.save`` (ref
``src/pipelines/training.py:150-182``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

from .checkpoint import checkpoint_filename
from .state import TrainState

Bounds = tuple[tuple[int, int], ...]

MANIFEST = "manifest.json"


def _bounds_str(bounds: Bounds) -> str:
    return ";".join(f"{a}:{b}" for a, b in bounds)


def _parse_bounds(text: str) -> Bounds:
    if not text:
        return ()
    return tuple(
        (int(a), int(b))
        for a, b in (part.split(":") for part in text.split(";"))
    )


def _shard_bounds(index: tuple, shape: tuple[int, ...]) -> Bounds:
    """Concrete (start, stop) per dim from a shard's index (slices)."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return tuple(out)


def state_to_host_shards(state: Any) -> dict[str, np.ndarray]:
    """Pull only this process's addressable shards to host, piece-keyed.

    The sharded analog of ``state_to_host``: feed the result to several
    :func:`save_sharded_checkpoint` calls in one epoch (best + last) so the
    device->host transfer happens once per epoch, not per file.
    """
    pieces: dict[str, np.ndarray] = {}
    for leaf_pieces in _flatten_to_pieces(state).values():
        pieces.update(leaf_pieces)
    return pieces


def _flatten_to_pieces(state_like_tree: Any) -> dict[str, dict[str, np.ndarray]]:
    """Per-leaf piece dicts: {leaf_key: {piece_key: host array}}."""
    out: dict[str, dict[str, np.ndarray]] = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state_like_tree)[0]
    for path, leaf in leaves_with_paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
        pieces: dict[str, np.ndarray] = {}
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            shape = leaf.shape
            for shard in leaf.addressable_shards:
                if shard.replica_id != 0:
                    continue  # exactly one device worldwide owns each piece
                bounds = _shard_bounds(shard.index, shape)
                pieces[f"{key}::{_bounds_str(bounds)}"] = np.asarray(shard.data)
        elif jax.process_index() == 0:
            arr = np.asarray(leaf)
            bounds = tuple((0, d) for d in arr.shape)
            pieces[f"{key}::{_bounds_str(bounds)}"] = arr
        out[key] = pieces
    return out


def _shard_file(process_index: int) -> str:
    return f"shards_p{process_index:05d}.npz"


def save_sharded_checkpoint(
    directory: Path | str,
    state: TrainState | None = None,
    *,
    experiment_name: str,
    epoch: int,
    metric_name: str | None,
    metric_value: float | None,
    template: str | None = None,
    host_pieces: dict[str, np.ndarray] | None = None,
) -> Path:
    """Each process writes its own shard file; process 0 adds the manifest.

    Mirrors :func:`checkpoint.save_checkpoint`'s signature (the filename
    template names the checkpoint *directory* here). No cross-process
    barrier is taken — callers that need all files on disk before reading
    should synchronise (the training pipeline reads only at resume, a
    fresh program start).
    """
    directory = Path(directory)
    name = checkpoint_filename(
        template,
        experiment_name=experiment_name,
        metric_name=metric_name,
        metric_value=metric_value,
        epoch=epoch,
    )
    path = directory / name
    path.mkdir(parents=True, exist_ok=True)

    if jax.process_index() == 0:
        # Prune shard files a previous save with MORE processes left
        # behind: files p0..p{count-1} are overwritten below, but stale
        # higher-index files would otherwise be globbed in on restore and
        # make _assemble see overlapping pieces (restore correctness is
        # ALSO guarded by the manifest's num_processes filter in
        # _PieceIndex — this is hygiene for the common shared-FS case).
        # No process writes these names this run, so there is no race.
        for stale in path.glob("shards_p*.npz"):
            try:
                if int(stale.stem.rpartition("p")[2]) >= jax.process_count():
                    stale.unlink()
            except (ValueError, OSError):
                pass

    pieces = host_pieces if host_pieces is not None else state_to_host_shards(state)
    with open(path / _shard_file(jax.process_index()), "wb") as handle:
        np.savez(handle, **pieces)

    if jax.process_index() == 0:
        meta = {
            "epoch": epoch,
            "metric_name": metric_name,
            "metric_value": metric_value,
            "timestamp": time.time(),
            "format_version": 2,
            "num_processes": jax.process_count(),
        }
        (path / MANIFEST).write_text(json.dumps(meta))
    return path


class _PieceIndex:
    """Lazy view over the manifest's shard files: leaf key -> [(bounds,
    loader)].

    ``num_processes`` (from the manifest) bounds the glob: a checkpoint
    saved with fewer processes than an earlier save into the same
    directory must not pick up the stale higher-index ``shards_p*`` files
    — their pieces would overlap this save's and fail (or corrupt)
    assembly.
    """

    def __init__(self, path: Path, num_processes: int | None = None):
        self._files = []
        self.by_leaf: dict[str, list[tuple[Bounds, Callable[[], np.ndarray]]]] = {}
        for shard_path in sorted(path.glob("shards_p*.npz")):
            if num_processes is not None:
                try:
                    if int(shard_path.stem.rpartition("p")[2]) >= num_processes:
                        continue
                except ValueError:
                    continue
            blob = np.load(shard_path, allow_pickle=False)
            self._files.append(blob)
            for piece_key in blob.files:
                leaf_key, _, bounds_text = piece_key.rpartition("::")
                bounds = _parse_bounds(bounds_text)
                self.by_leaf.setdefault(leaf_key, []).append(
                    (bounds, (lambda b=blob, k=piece_key: b[k]))
                )
        if not self._files:
            raise FileNotFoundError(f"No shard files under {path}")

    def close(self) -> None:
        """Release the underlying ``NpzFile`` handles (loaders die with
        them; repeated restores must not leak file descriptors)."""
        for blob in self._files:
            blob.close()
        self._files = []
        self.by_leaf = {}

    def pieces_for(
        self, leaf_key: str, shape: tuple[int, ...]
    ) -> list[tuple[Bounds, Callable[[], np.ndarray]]]:
        found = self.by_leaf.get(leaf_key)
        if found:
            return found
        return self._convert_moment_layout(leaf_key, shape)

    def _convert_moment_layout(self, leaf_key: str, shape):
        """Synthesise packed ``mv`` pieces from separate ``m``/``v`` pieces
        (and vice versa) — the layouts differ only by a lane offset, which
        composes with row sharding (shards span full rows)."""
        prefix, _, leaf_name = leaf_key.rpartition("/")
        if not prefix:
            return []
        out: list[tuple[Bounds, Callable[[], np.ndarray]]] = []
        if leaf_name == "mv" and len(shape) == 2:
            half = shape[1] // 2
            for src_name, offset in (("m", 0), ("v", half)):
                for bounds, get in self.by_leaf.get(f"{prefix}/{src_name}", []):
                    (r0, r1), (c0, c1) = bounds
                    out.append((((r0, r1), (c0 + offset, c1 + offset)), get))
        elif leaf_name in ("m", "v") and len(shape) == 2:
            half = shape[1]
            lo, hi = (0, half) if leaf_name == "m" else (half, 2 * half)
            for bounds, get in self.by_leaf.get(f"{prefix}/mv", []):
                (r0, r1), (c0, c1) = bounds
                nc0, nc1 = max(c0, lo), min(c1, hi)
                if nc0 >= nc1:
                    continue
                out.append(
                    (
                        ((r0, r1), (nc0 - lo, nc1 - lo)),
                        (
                            lambda g=get, a=nc0 - c0, b=nc1 - c0: g()[:, a:b]
                        ),
                    )
                )
        return out


def _assemble(
    pieces: list[tuple[Bounds, Callable[[], np.ndarray]]],
    index: tuple,
    shape: tuple[int, ...],
    dtype,
    leaf_key: str,
) -> np.ndarray:
    """Materialise the requested global-coordinate region from saved pieces.

    Pieces of one leaf are disjoint (``replica_id == 0`` filter at save), so
    overlap volume summing to the region's size proves full coverage."""
    want = _shard_bounds(index, shape) if index else tuple((0, d) for d in shape)
    if not want:  # scalar leaf
        if not pieces:
            raise ValueError(f"Checkpoint has no data for scalar '{leaf_key}'")
        return pieces[0][1]().astype(dtype, copy=False)
    out_shape = tuple(b - a for a, b in want)
    out = np.empty(out_shape, dtype)
    covered = 0
    for bounds, get in pieces:
        overlap = tuple(
            (max(a, wa), min(b, wb)) for (a, b), (wa, wb) in zip(bounds, want)
        )
        if any(a >= b for a, b in overlap):
            continue
        src = get()[
            tuple(slice(a - pa, b - pa) for (a, b), (pa, _) in zip(overlap, bounds))
        ]
        out[
            tuple(slice(a - wa, b - wa) for (a, b), (wa, _) in zip(overlap, want))
        ] = src
        covered += int(np.prod([b - a for a, b in overlap]))
    if covered != int(np.prod(out_shape)):
        raise ValueError(
            f"Checkpoint pieces cover {covered}/{int(np.prod(out_shape))} "
            f"elements of '{leaf_key}' region {want} — saved under an "
            f"incompatible shape/config?"
        )
    return out


def load_sharded_checkpoint(
    path: Path | str, template_state: TrainState
) -> tuple[TrainState, dict[str, Any]]:
    """Restore a sharded checkpoint against the template's shardings.

    Each leaf is rebuilt with ``jax.make_array_from_callback`` using the
    template leaf's sharding, so every process materialises exactly its
    addressable shards — no full-state host copy anywhere. Template leaves
    that are not placed ``jax.Array``s are assembled as host numpy arrays.
    """
    path = Path(path)
    meta = json.loads((path / MANIFEST).read_text())
    index = _PieceIndex(path, num_processes=meta.get("num_processes"))

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        template_state
    )
    new_leaves = []
    for pth, leaf in leaves_with_paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in pth
        )
        shape = tuple(np.shape(leaf))
        dtype = leaf.dtype if hasattr(leaf, "dtype") else np.asarray(leaf).dtype
        pieces = index.pieces_for(key, shape)
        if not pieces:
            raise ValueError(
                f"Checkpoint {path} has no pieces for leaf '{key}'; was it "
                "saved with a different config?"
            )
        if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
            arr = jax.make_array_from_callback(
                shape,
                leaf.sharding,
                lambda idx, p=pieces, s=shape, d=dtype, k=key: _assemble(
                    p, idx, s, d, k
                ),
            )
        else:
            arr = _assemble(pieces, (), shape, dtype, key)
        new_leaves.append(arr)
    # make_array_from_callback materialises every addressable shard
    # synchronously, so nothing reads the npz blobs after this point.
    index.close()
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta
