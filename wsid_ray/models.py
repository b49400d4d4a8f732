"""Pluggable model interface for the model-backed stages (VERDICT r03
item 7): language-ID and text embeddings ship deterministic FAKES (this
container has no model weights or network), but a user pointing the
engine at real corpora swaps in a real model WITHOUT touching the
stages.

A MODEL SPEC is any of:

  * ``None`` — the stage's builtin deterministic fake (default);
  * a callable — used directly (fine for tests / light models; note a
    driver-created callable is serialized into every task);
  * an import string ``"package.module:attr"`` — the cluster-safe form:
    only the STRING ships with the task, and the attribute is resolved
    by import inside the actor's ``__init__`` — so heavyweight model
    loads happen once per actor process, never through driver pickling.
    If the resolved attribute is itself callable-returning (a factory
    class / zero-arg function flagged by a trailing ``()``, e.g.
    ``"my_models:Embedder()"``), it is invoked once at resolve time.

Model contracts (list-in, numpy-out; batching is the stage's job):

  * embedding model: ``fn(texts: list[str]) -> np.ndarray (n, dim)``
  * langid model:    ``fn(texts: list[str]) -> (labels: list[str],
                       scores: array-like of float)``
"""

from __future__ import annotations

from importlib import import_module
from typing import Callable


def resolve_model(spec) -> Callable | None:
    """Resolve a model spec (see module doc) to a callable, or None for
    the stage's builtin fake.  Called from actor ``__init__`` so import
    and construction costs are paid once per actor process."""
    if spec is None:
        return None
    if callable(spec):
        return spec
    if isinstance(spec, str):
        mod, _, attr = spec.partition(":")
        if not mod or not attr:
            raise ValueError(
                f"model spec {spec!r} must look like 'module:attr'")
        call_it = attr.endswith("()")
        obj = getattr(import_module(mod), attr[:-2] if call_it else attr)
        return obj() if call_it else obj
    raise TypeError(f"unsupported model spec type {type(spec).__name__}")
