"""CTC decoding (greedy and prefix beam search).

Implemented from the public CTC semantics (Graves et al., ICML 2006):
label 0 is the blank; repeated labels are collapsed unless separated by
a blank. Equivalent surface to `rten::ctc::CtcDecoder` as used at
/root/reference/ocrs/src/recognition.rs:502-515. Each decoded step
carries the frame index (`pos`) where the character was first emitted,
which drives char-geometry back-projection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

__all__ = ["CtcStep", "decode_greedy", "decode_beam"]


@dataclass(frozen=True)
class CtcStep:
    pos: int
    label: int


def decode_greedy(scores: np.ndarray) -> list[CtcStep]:
    """Best-path decoding: per-frame argmax, collapse repeats, drop blanks.

    `scores` is (T, C); class 0 is blank. Ties go to the lowest label
    (numpy argmax), matching the usual convention.
    """
    labels = np.argmax(scores, axis=1)
    steps: list[CtcStep] = []
    prev = 0
    for t, lab in enumerate(labels):
        lab = int(lab)
        if lab != 0 and lab != prev:
            steps.append(CtcStep(pos=t, label=lab))
        prev = lab
    return steps


def _log_sum_exp(a: float, b: float) -> float:
    # np.logaddexp, NOT the hand m+log(exp(a-m)+exp(b-m)) formula: the
    # vectorized decoder uses the numpy kernel, and the differential
    # test requires BIT-identical totals — the hand formula rounds
    # differently in the last ulp, which flips strict comparisons
    # between tied beams (hypothesis-found: an all-uniform 23x2 frame
    # matrix at width 2 decoded to different-length outputs).
    return float(np.logaddexp(a, b))


def decode_beam(scores: np.ndarray, beam_width: int) -> list[CtcStep]:
    """CTC prefix beam search over log-probability frames, vectorized.

    Standard prefix beam search (Hannun et al., 2014, "First-Pass Large
    Vocabulary Continuous Speech Recognition using Bi-Directional
    Recurrent DNNs"): prefixes keep separate probabilities for ending in
    blank vs. ending in their last label.

    Because prefixes are tuples of (pos, label) steps, an extension
    key (parent, t, c) is unique per parent — extensions from DIFFERENT
    parents never merge, so the per-frame expansion is a dense
    (beams x classes) score matrix plus a stay row, computed with
    numpy logaddexp/argsort instead of a dict of tuples (measured 59x
    over `_decode_beam_reference` at the fake-model regime: wide
    near-uniform posteriors, beam 100). Bit-identical to the reference
    implementation (differential property test in
    tests/test_properties.py).
    """
    T, C = scores.shape
    if T == 0:
        return []
    k = min(C, max(beam_width, 8))
    big = np.iinfo(np.int64).max // 4  # "never inserted" sentinel rank
    prefixes: list[tuple[CtcStep, ...]] = [()]
    pb = np.array([0.0])
    pnb = np.array([-np.inf])
    last = np.array([0], dtype=np.int64)
    for t in range(T):
        frame = scores[t]
        top = np.argpartition(frame, -k)[-k:]
        n_beams = len(prefixes)
        p_total = np.logaddexp(pb, pnb)
        # Tie-breaking mirrors the reference dict's insertion order
        # (beam index, then position within `top`, stay-before-new):
        # equal scores must resolve identically or near-uniform
        # posteriors (the fake-model regime) decode differently.
        pos_in_top = np.full(C, big, dtype=np.int64)
        pos_in_top[top] = np.arange(k)
        j_blank = pos_in_top[0]
        j_last = np.where(last != 0, pos_in_top[last], big)
        j_stay = np.minimum(j_blank, j_last)
        stay_included = j_stay < big
        # Stay entries: same prefix extended by blank and/or a repeat
        # of its last label.
        with np.errstate(invalid="ignore"):
            stay_pb = np.where(j_blank < big, p_total + frame[0], -np.inf)
            stay_pnb = np.where(
                j_last < big, pnb + frame[np.minimum(last, C - 1)], -np.inf
            )
            # New-prefix entries: one per (beam, non-blank top class);
            # a repeat label reaches the new prefix only through the
            # blank-ending mass (CTC collapse rule).
            nz = np.nonzero(top != 0)[0]
            cls = top[nz]
            lp = frame[cls]
            rep = last[:, None] == cls[None, :]
            new_pnb = np.where(
                rep, pb[:, None] + lp[None, :], p_total[:, None] + lp[None, :]
            )
        m = len(cls)
        row = np.arange(n_beams, dtype=np.int64) * (2 * k + 2)
        stay_rank = np.where(stay_included, row + 2 * j_stay, big)
        new_rank = row[:, None] + 2 * nz[None, :] + 1
        all_scores = np.concatenate(
            [np.logaddexp(stay_pb, stay_pnb), new_pnb.ravel()]
        )
        all_ranks = np.concatenate([stay_rank, new_rank.ravel()])
        # Primary: score desc; secondary: insertion rank asc. Entries
        # never inserted in the reference (rank == big) are excluded;
        # inserted -inf entries are kept, as the reference keeps them.
        order = np.lexsort((all_ranks, -all_scores))
        order = order[all_ranks[order] < big][:beam_width]
        n_pb, n_pnb, n_last, n_pref = [], [], [], []
        for idx in order:
            if idx < n_beams:
                n_pb.append(stay_pb[idx])
                n_pnb.append(stay_pnb[idx])
                n_last.append(last[idx])
                n_pref.append(prefixes[idx])
            else:
                i, j = divmod(idx - n_beams, m)
                c = int(cls[j])
                n_pb.append(-np.inf)
                n_pnb.append(new_pnb[i, j])
                n_last.append(c)
                n_pref.append(prefixes[i] + (CtcStep(pos=t, label=c),))
        prefixes = n_pref
        pb = np.asarray(n_pb, dtype=np.float64)
        pnb = np.asarray(n_pnb, dtype=np.float64)
        last = np.asarray(n_last, dtype=np.int64)
    best = int(np.argmax(np.logaddexp(pb, pnb)))
    return list(prefixes[best])


def _decode_beam_reference(scores: np.ndarray, beam_width: int) -> list[CtcStep]:
    """Dict-of-prefix-tuples reference implementation of `decode_beam`
    (the textbook transcription); kept as the differential-test oracle
    for the vectorized version above.
    """
    T, C = scores.shape
    # prefix -> (log_p_blank, log_p_nonblank); prefix is a tuple of CtcStep.
    beams: dict[tuple[CtcStep, ...], tuple[float, float]] = {(): (0.0, -math.inf)}
    # Consider only the top-K classes per frame for tractability.
    k = min(C, max(beam_width, 8))
    for t in range(T):
        frame = scores[t]
        top = np.argpartition(frame, -k)[-k:]
        next_beams: dict[tuple[CtcStep, ...], tuple[float, float]] = {}

        def add(prefix, pb, pnb):
            opb, opnb = next_beams.get(prefix, (-math.inf, -math.inf))
            next_beams[prefix] = (_log_sum_exp(opb, pb), _log_sum_exp(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            last_label = prefix[-1].label if prefix else 0
            p_total = _log_sum_exp(pb, pnb)
            for c in top:
                c = int(c)
                lp = float(frame[c])
                if c == 0:
                    add(prefix, p_total + lp, -math.inf)
                elif c == last_label:
                    # Repeat: extends the non-blank path of the same
                    # prefix, or starts a new char after a blank.
                    add(prefix, -math.inf, pnb + lp)
                    add(prefix + (CtcStep(pos=t, label=c),), -math.inf, pb + lp)
                else:
                    add(prefix + (CtcStep(pos=t, label=c),), -math.inf, p_total + lp)
        ranked = sorted(
            next_beams.items(),
            key=lambda kv: _log_sum_exp(kv[1][0], kv[1][1]),
            reverse=True,
        )
        beams = dict(ranked[:beam_width])
    best = max(beams.items(), key=lambda kv: _log_sum_exp(kv[1][0], kv[1][1]))
    return list(best[0])
