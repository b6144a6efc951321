"""Shared pure-Python BPE reference (Sennrich-style pair statistics +
greedy left-to-right merge over word types) — the single ground-truth
implementation every BPE test validates the relational operator
against."""

from __future__ import annotations

from collections import Counter


def ref_bpe_learn(words: list[str], rounds: int):
    """Run `rounds` merge rounds; returns (report, seqs) where report
    is [(round, rank, sym1, sym2, cnt), ...] (top-10 per round, counts
    taken BEFORE that round's merge) and seqs the final per-word-type
    segmentation."""
    freq = Counter(words)
    seqs = {w: list(w) for w in freq}
    report = []
    for r in range(1, rounds + 1):
        stats: Counter = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += freq[w]
        ranked = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        report.extend(
            (r, i + 1, p[0], p[1], c) for i, (p, c) in enumerate(ranked[:10])
        )
        if ranked:
            (b1, b2), _ = ranked[0]
            for w, syms in seqs.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == b1 and syms[i + 1] == b2:
                        merged.append(b1 + b2)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                seqs[w] = merged
    return report, seqs
