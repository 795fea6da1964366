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
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def decode_beam(scores: np.ndarray, beam_width: int) -> list[CtcStep]:
    """CTC prefix beam search over log-probability frames.

    Standard prefix beam search (Hannun et al., 2014, "First-Pass Large
    Vocabulary Continuous Speech Recognition using Bi-Directional
    Recurrent DNNs"): prefixes keep separate probabilities for ending in
    blank vs. ending in their last label.
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
