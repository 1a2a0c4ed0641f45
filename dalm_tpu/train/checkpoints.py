"""Orbax checkpoint/resume with the reference's layout semantics.

Reference behavior to preserve (`train_rage2e.py:389-414,486-506`,
`train_utils.py:16-73`):
- periodic dirs named ``step_{k}`` (every N optimizer steps) and
  ``epoch_{e}`` (per epoch);
- resume parses the basename to recover epoch/step and skips already-seen
  batches;
- the combined state splits into retriever/generator subtrees (our param
  tree is already ``{"retriever": ..., "generator": ...}``).

Orbax adds what the reference lacked: atomic async saves and
sharding-aware restore (arrays come back on the mesh they were saved
from).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_state(root: str, tag: str, state_tree: Any) -> str:
    """Save under ``{root}/{tag}`` (tag = ``step_{k}`` or ``epoch_{e}``)."""
    path = os.path.abspath(os.path.join(root, tag))
    with _ckptr() as ckptr:
        ckptr.save(path, state_tree, force=True)
    return path


def load_state(path: str, abstract_state: Any) -> Any:
    path = os.path.abspath(path)
    with _ckptr() as ckptr:
        return ckptr.restore(path, abstract_state)


def abstract_like(tree: Any) -> Any:
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)


def parse_checkpoint_tag(path: str) -> tuple[str, int]:
    """``.../step_40`` → ("step", 40); ``.../epoch_2`` → ("epoch", 2).

    Twin of the reference's dir-name parsing (`train_rage2e.py:400-414`).
    """
    base = os.path.basename(os.path.normpath(path))
    m = re.fullmatch(r"(step|epoch)_(\d+)", base)
    if not m:
        raise ValueError(f"checkpoint dir {base!r} not of form step_<k>/epoch_<e>")
    return m.group(1), int(m.group(2))


def prune_checkpoints(root: str, keep_last: int = 3, kind: str = "step") -> int:
    """Remove all but the newest ``keep_last`` ``{kind}_*`` dirs.

    The reference accumulates step_k dirs forever; bounded retention is
    table stakes for long runs. Returns the number removed.
    """
    import shutil

    if not os.path.isdir(root):
        return 0
    found = []
    for d in os.listdir(root):
        full = os.path.join(root, d)
        if os.path.isdir(full):
            try:
                k, num = parse_checkpoint_tag(full)
            except ValueError:
                continue
            if k == kind:
                found.append((num, full))
    found.sort()
    removed = 0
    for _, path in found[:-keep_last] if keep_last > 0 else found:
        shutil.rmtree(path, ignore_errors=True)
        removed += 1
    return removed


def latest_checkpoint(root: str) -> Optional[str]:
    """Most recent checkpoint dir under root (epochs outrank steps within)."""
    if not os.path.isdir(root):
        return None
    candidates = []
    for d in os.listdir(root):
        full = os.path.join(root, d)
        if os.path.isdir(full):
            try:
                kind, num = parse_checkpoint_tag(full)
            except ValueError:
                continue
            candidates.append((os.path.getmtime(full), kind, num, full))
    if not candidates:
        return None
    return max(candidates)[3]
