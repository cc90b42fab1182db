"""Feature co-activation analysis: which latents fire together.

Streams the activation cache through a trained coder's encoder a second
time (same batching as the tracker pass) and accumulates, for a chosen
feature subset, the [M, M] co-occurrence count matrix ON DEVICE — one
jitted ``act.T @ act`` per batch, so cost is one small matmul per batch
and nothing quadratic in the full feature count F.  Pairs are scored by
Jaccard overlap ``|A∩B| / |A∪B|``.

Co-firing features indicate feature splitting (one concept split across
latents) or compositional structure — standard SAE-audit tooling the
reference lacks entirely.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _accumulate(counts: jax.Array, hidden_sub: jax.Array) -> jax.Array:
    """counts [M, M] += (hidden_sub > 0)^T (hidden_sub > 0)."""
    act = (hidden_sub > 0.0).astype(jnp.float32)
    return counts + jnp.dot(
        act.T, act, preferred_element_type=jnp.float32
    )


def compute_coactivation(
    encode_chunk,
    num_samples: int,
    batch_samples: int,
    feature_indices: list[int],
    top_pairs: int = 50,
) -> dict:
    """Co-occurrence statistics for ``feature_indices``.

    Args:
        encode_chunk: (lo, hi) -> [rows, F] hidden activations (the
            analyze job's streaming encoder).
        num_samples / batch_samples: the same batching as the tracker
            pass (host memory stays bounded).
        feature_indices: subset of features (typically the report's top
            features).
        top_pairs: how many highest-Jaccard pairs to return.

    Returns a JSON-ready dict: per-feature firing rates and the top
    co-activating pairs with counts and Jaccard scores.
    """
    idx = jnp.asarray(sorted(set(int(i) for i in feature_indices)))
    m = int(idx.shape[0])
    counts = jnp.zeros((m, m), jnp.float32)
    total_rows = 0
    for lo in range(0, num_samples, batch_samples):
        hi = min(lo + batch_samples, num_samples)
        hidden = jnp.asarray(encode_chunk(lo, hi))
        # column gather of the M tracked features — analysis path, not
        # the training hot path, and M is small (~top-N of the report)
        counts = _accumulate(counts, hidden[:, idx])
        total_rows += int(hidden.shape[0])
    counts = np.asarray(counts)
    feats = [int(i) for i in np.asarray(idx)]
    solo = np.diag(counts)

    pairs = []
    for a in range(m):
        for b in range(a + 1, m):
            inter = counts[a, b]
            union = solo[a] + solo[b] - inter
            if inter > 0 and union > 0:
                pairs.append((
                    float(inter / union), int(inter), feats[a], feats[b]
                ))
    pairs.sort(reverse=True)
    return {
        "num_tokens": total_rows,
        "features": feats,
        "firing_rate": {
            str(f): round(float(solo[i] / max(total_rows, 1)), 6)
            for i, f in enumerate(feats)
        },
        "top_pairs": [
            {
                "feature_a": fa,
                "feature_b": fb,
                "jaccard": round(j, 5),
                "co_count": c,
            }
            for j, c, fa, fb in pairs[:top_pairs]
        ],
    }


def save_coactivation(result: dict, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(result, indent=2))
    return path
