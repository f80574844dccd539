"""Perplexity scoring stage - stateful actor pool for ``map_batches``.

Equivalent of the reference's RMI LM scoring
(``DecesiveValueProducerPerplexity.innerProcess`` + ``getPerplexity``,
``lt.ltbot/.../postprocessor/DecesiveValueProducerPerplexity.java:247-339``):

* empty text -> +Infinity -> reset to -1,
* non-finite or <= 1 perplexity -> -1 (the prioritizer then rejects
  children of this page),
* the ``%012g`` string form is what the prioritizer parses
  (``DecesiveValuePrioritizer.java:175``) - kept as ``perp_str``.

The model is fetched from the object store once per actor
(``__init__``), never per batch.
"""

from __future__ import annotations

import math

import pyarrow as pa

from ..functions.strings import format_g12
from ..lm.perplexity import ModelPerplexity, document_perplexity


def score_text(lm, text: str) -> float:
    """Reference ``getPerplexity``: empty -> inf; then -1 normalisation."""
    if text == "":
        perp = math.inf
    else:
        perp = document_perplexity(lm, text)
    if not math.isfinite(perp) or perp <= 1.0:
        perp = -1.0
    return perp


class PerplexityScorer:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools.

    ``lm_ref`` may be a ``ray.ObjectRef`` (preferred: broadcast once) or a
    plain LM object (unit tests).
    """

    def __init__(self, lm_ref, text_column: str = "score_text"):
        import ray

        self._lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self._text_column = text_column
        # warm the per-process caches (ruleset, char tables) once
        ModelPerplexity(self._lm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lm = self._lm
        texts = batch.column(self._text_column).to_pylist()
        perps = [score_text(lm, t) for t in texts]
        perp_strs = [format_g12(p) for p in perps]
        return batch.append_column("perp", pa.array(perps, pa.float64())).append_column(
            "perp_str", pa.array(perp_strs, pa.string())
        )
