"""Multinomial Naive-Bayes log-likelihood-ratio weights — the pure
arithmetic core of the q117 quality classifier, shared by the Spark
builder and the DuckDB oracle generator (the ``functions/bpe.py`` /
``lloyd_centroids`` one-source-of-truth discipline).

This is the fastText/NB-shaped "quality classifier" of the GPT-3 and
CCNet data pipelines (Brown et al. 2020 §A; Wenzek et al. 2020): train
a linear token-weight model on a labeled reference corpus, score every
candidate document, keep the high-scoring tail. The classifier is
LINEAR in token counts, so scoring distributes as one explode + one
token-keyed join + one per-doc sum — the same plan shape as q96/q110.

Determinism contract: training reduces the corpus to EXACT integer
token counts (a distributed groupBy — the only corpus-sized pass);
the weight table is then O(vocabulary) driver state computed in
float64 ``math.log`` and rounded to INTEGER micro-units here, in one
shared function. Both engines aggregate the same integer counts, call
this same code, and from then on every per-document score is an int64
sum — hash-exact. (Computing logs SQL-side instead would tie the
verdict to two libm implementations agreeing to the last ulp.)

Laplace smoothing: P(t|c) = (cnt_c(t)+1) / (tot_c+V) over the TRAIN
vocabulary union; unseen tokens at scoring time contribute 0 (handled
by the scoring join's coalesce, not by the weight table).
"""

from __future__ import annotations

import math

SCALE = 1_000_000


def nb_weights(
    counts_a: dict[str, int],
    counts_b: dict[str, int],
) -> dict[str, int]:
    """token -> round(SCALE * log-likelihood ratio) for the union
    vocabulary: w_t = S * [log (cA_t+1)/(totA+V) − log (cB_t+1)/(totB+V)].

    Positive means the token is evidence for class A. Integer
    micro-units keep every downstream sum exact int64 arithmetic: at
    |w| ≤ ~30·S per token and ≤ 10^6 tokens per document, scores stay
    ≪ 2^53 ≪ int64 max."""
    vocab = sorted(set(counts_a) | set(counts_b))
    v = len(vocab)
    tot_a = sum(counts_a.values())
    tot_b = sum(counts_b.values())
    out: dict[str, int] = {}
    for t in vocab:
        la = math.log(counts_a.get(t, 0) + 1) - math.log(tot_a + v)
        lb = math.log(counts_b.get(t, 0) + 1) - math.log(tot_b + v)
        out[t] = round(SCALE * (la - lb))
    return out


def nb_prior(n_docs_a: int, n_docs_b: int) -> int:
    """round(SCALE * log(nA/nB)) — the class-prior term added once per
    document."""
    return round(SCALE * (math.log(n_docs_a) - math.log(n_docs_b)))
