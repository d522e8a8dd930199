"""Byte-pair-encoding tokenizer training — the pure sequential core.

This module is the single source of truth for the BPE arithmetic, the
same role ``lloyd_centroids`` plays for IVF: the Spark side (q107)
feeds it the DISTRIBUTED corpus word counts, the DuckDB oracle feeds
it word counts computed by SQL, and both must land on the identical
merge table — so every rule here is deterministic:

 * a word enters training as its character list + a '</w>' end marker
   (the textbook Sennrich et al. 2016 formulation);
 * each round merges the pair with the highest corpus count, ties
   broken by the lexicographically SMALLEST (left, right) pair;
 * merged symbols concatenate textually, and a merged pair is applied
   left-to-right, non-overlapping, in every vocabulary word.

Scale note: training cost after the corpus word-count aggregation is
O(|vocab| · k) — the vocabulary, not the corpus, which is why every
production BPE trainer runs on the word-frequency dictionary. The
corpus-sized work (the count aggregation, and later re-tokenization)
is what Spark distributes.
"""

from __future__ import annotations

from collections import Counter


def _merge_word(s: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(s):
        if i < len(s) - 1 and s[i] == left and s[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def bpe_merges(word_counts: dict[str, int], k: int) -> list[tuple[str, str, int]]:
    """Train ``k`` merges over a word-frequency dictionary; returns
    [(left, right, pair_count)] in merge order. Stops early when no
    pair occurs twice."""
    syms = {w: list(w) + ["</w>"] for w in word_counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(k):
        pc: Counter = Counter()
        for w in sorted(word_counts):
            c = word_counts[w]
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        for w in syms:
            syms[w] = _merge_word(syms[w], left, right)
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Segment one word with a trained merge table (applied in rank
    order — the standard greedy BPE application)."""
    s = list(word) + ["</w>"]
    for left, right, _ in merges:
        s = _merge_word(s, left, right)
    return s
