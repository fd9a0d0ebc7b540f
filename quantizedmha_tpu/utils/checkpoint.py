"""Checkpoint / resume.

The reference had NO checkpointing — only binary caches of computed results
(SURVEY.md §5: main.cu:15-19, verify.cu:106-151). A serving/training
framework needs real state snapshots: this module provides step-numbered
checkpoints of arbitrary JAX pytrees (model params, optimizer state, engine
KV-cache arrays) with resume, retention, and optional sharding restore onto
a device mesh.

Orbax is used when importable (it is in the target image); otherwise a
self-contained .npz fallback handles the same API — checkpoints written by
one backend are not interchangeable with the other, so the backend is
recorded in the checkpoint directory.
"""

from __future__ import annotations

import json
import pathlib
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np

_STEP_RE = re.compile(r"^step_(\d+)$")


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
             for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def _save_npz(path: pathlib.Path, tree: Any) -> None:
    paths, leaves, _ = _flatten_with_paths(tree)
    arrays = {f"arr_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path / "leaves.npz", **arrays)
    (path / "tree.json").write_text(json.dumps({"paths": paths}))


def _load_npz(path: pathlib.Path, like: Any) -> Any:
    data = np.load(path / "leaves.npz")
    leaves = [data[f"arr_{i}"] for i in range(len(data.files))]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(like_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {len(like_leaves)}"
        )
    # Leaf COUNT alone can collide across different tree structures — a
    # same-count template would silently bind arrays to the wrong keys.
    # tree.json records the flattened key paths at save time; verify them.
    tree_meta = path / "tree.json"
    if tree_meta.exists():
        saved_paths = json.loads(tree_meta.read_text())["paths"]
        like_paths, _, _ = _flatten_with_paths(like)  # same format as save
        if saved_paths != like_paths:
            bad = next(
                (a, b) for a, b in zip(saved_paths, like_paths) if a != b
            ) if len(saved_paths) == len(like_paths) else (None, None)
            raise ValueError(
                f"checkpoint tree does not match template: first differing "
                f"path {bad[0]!r} (saved) vs {bad[1]!r} (template)"
            )
    # Enforce the class contract: restore INTO the template's shapes/dtypes
    # (the orbax path's abstract-tree restore already does). A dtype drift
    # between save and restore must not silently flow through — at best it
    # forces recompiles, at worst it changes numerics.
    cast = []
    for i, (leaf, like_leaf) in enumerate(zip(leaves, like_leaves)):
        want_shape = np.shape(like_leaf)
        if leaf.shape != want_shape:
            raise ValueError(
                f"checkpoint leaf {i} has shape {leaf.shape}, template "
                f"expects {want_shape}"
            )
        cast.append(np.asarray(leaf, dtype=np.asarray(like_leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, cast)


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError:
        return None


class CheckpointManager:
    """Step-numbered checkpoints under one directory.

    save(step, tree)  -> writes <dir>/step_<n>/
    restore(like, step=None) -> latest (or given) step restored into the
                                structure/dtypes of `like`
    """

    def __init__(self, directory, *, keep: int = 3, backend: Optional[str] = None):
        self.dir = pathlib.Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        if backend is None:
            backend = "orbax" if _orbax() is not None else "npz"
        self.backend = backend

    # -- inventory -----------------------------------------------------------

    def steps(self) -> list:
        out = []
        for child in self.dir.iterdir():
            m = _STEP_RE.match(child.name)
            if m and not (child / ".incomplete").exists():
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.steps()
        return steps[-1] if steps else None

    # -- save / restore --------------------------------------------------------

    def save(self, step: int, tree: Any) -> pathlib.Path:
        path = self.dir / f"step_{step}"
        if path.exists():
            shutil.rmtree(path)
        path.mkdir(parents=True)
        # Crash-safe marker: removed only after a complete write, so a
        # half-written checkpoint is never offered for resume.
        marker = path / ".incomplete"
        marker.touch()
        ocp = _orbax() if self.backend == "orbax" else None
        if ocp is not None:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path / "state", tree, force=True)
            ckptr.wait_until_finished()
            ckptr.close()
        else:
            _save_npz(path, tree)
        (path / "meta.json").write_text(
            json.dumps({"step": step, "backend": self.backend})
        )
        marker.unlink()
        self._gc()
        return path

    def restore(self, like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        path = self.dir / f"step_{step}"
        meta = json.loads((path / "meta.json").read_text())
        if meta["backend"] == "orbax":
            ocp = _orbax()
            if ocp is None:
                raise RuntimeError("checkpoint written by orbax but orbax missing")
            ckptr = ocp.StandardCheckpointer()
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
                if not isinstance(x, jax.ShapeDtypeStruct) else x,
                like,
            )
            out = ckptr.restore(path / "state", abstract)
            ckptr.close()
            return out
        return _load_npz(path, like)

    def restore_sharded(self, like: Any, shardings: Any, step: Optional[int] = None) -> Any:
        """Restore and place each leaf with the matching sharding
        (`jax.device_put`), for resuming onto a device mesh."""
        host = self.restore(like, step=step)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jax.numpy.asarray(x), s), host, shardings
        )

    # -- retention -------------------------------------------------------------

    def _gc(self) -> None:
        steps = self.steps()
        for old in steps[: max(0, len(steps) - self.keep)]:
            shutil.rmtree(self.dir / f"step_{old}", ignore_errors=True)
