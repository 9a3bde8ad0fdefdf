"""Hermetic statistical NER: a tiny averaged-perceptron BIO tagger
with frozen in-repo weights, API-compatible with the spaCy surface the
N2 adapter consumes (r5 VERDICT item 5).

The real-model seam (text/ner_model.py — the reference loads
``en_core_web_md``, /root/reference/src/scraper.py:6) was env-gated:
its ``mapInPandas`` batching, per-worker singleton, and span-schema
mapping had never executed in a verified run because no model ships in
this container. This module closes that the way r5's PPM codec did for
images: a real *statistical* model (greedy averaged-perceptron BIO
tagging — the standard structured-perceptron recipe from the public
NLP literature, e.g. Collins 2002) small enough to vendor as a JSON
weight file, wrapped in the minimal spaCy API (``pipe`` yielding docs
with ``.ents`` carrying ``start``/``end``/``text``/``label_``) so
``spacy_ner(docs, model=MINI_MODEL)`` runs the EXACT adapter code
path — batching, singleton caching, 1-based span mapping —
unconditionally in every runtime. spaCy itself remains the env-gated
golden on top.

Weights (``data/mini_ner_weights.json``) are trained by
``tools/train_mini_ner.py`` on the small annotated corpus embedded
there (fixture-corpus names + offshore-leaks-flavored sentences) with
a fixed shuffle seed — retraining reproduces the file byte-identically.
Tokenization is single-space splitting, the repo-wide convention
(text/annotations.py), so spans compose with the ruler/linker tiers.
"""

from __future__ import annotations

import json
import os

MINI_MODEL = "mini-ner-perceptron"
WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "data", "mini_ner_weights.json")

_START = ("<s>", "<s2>")


def _shape(tok: str) -> str:
    """Collapsed character-class shape: 'Londex' -> 'Xx', 'S.A.' ->
    'X.X.', '42nd' -> 'dx'."""
    out = []
    for ch in tok:
        c = "X" if ch.isupper() else "x" if ch.islower() else "d" if ch.isdigit() else ch
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def _features(toks: list[str], i: int, prev: str, prev2: str) -> list[str]:
    t = toks[i]
    prev_w = toks[i - 1] if i else "<s>"
    next_w = toks[i + 1] if i + 1 < len(toks) else "</s>"
    return [
        "bias",
        "w=" + t.lower(),
        "suf3=" + t[-3:].lower(),
        "pre1=" + t[:1].lower(),
        "shape=" + _shape(t),
        "prevtag=" + prev,
        "prevtags=" + prev2 + "|" + prev,
        "prevw=" + prev_w.lower(),
        "nextw=" + next_w.lower(),
        "prevshape=" + _shape(prev_w),
        "nextshape=" + _shape(next_w),
        "istitle=" + str(t[:1].isupper() and t[1:].islower()),
        "isupper=" + str(t.isupper()),
        "hasdigit=" + str(any(c.isdigit() for c in t)),
        "hasperiod=" + str("." in t),
        "w+prevtag=" + t.lower() + "|" + prev,
        "shape+nextshape=" + _shape(t) + "|" + _shape(next_w),
    ]


class AveragedPerceptron:
    """Multiclass averaged perceptron: sparse feature -> per-class
    weights, with the lazy-update averaging trick so training stays
    O(active features)."""

    def __init__(self, classes: list[str] | None = None):
        self.classes: list[str] = classes or []
        self.weights: dict[str, dict[str, float]] = {}
        self._totals: dict[tuple[str, str], float] = {}
        self._tstamps: dict[tuple[str, str], int] = {}
        self.i = 0

    def predict(self, features: list[str]) -> str:
        scores: dict[str, float] = {}
        for f in features:
            for cls, w in self.weights.get(f, {}).items():
                scores[cls] = scores.get(cls, 0.0) + w
        # stable tie-break: highest score, then lexicographic (so "O"
        # beats entity tags only on genuine score ties consistently)
        return max(self.classes, key=lambda c: (scores.get(c, 0.0), c))

    def update(self, truth: str, guess: str, features: list[str]) -> None:
        self.i += 1
        if truth == guess:
            return
        for f in features:
            w = self.weights.setdefault(f, {})
            for cls, delta in ((truth, 1.0), (guess, -1.0)):
                key = (f, cls)
                self._totals[key] = self._totals.get(key, 0.0) + (
                    self.i - self._tstamps.get(key, 0)
                ) * w.get(cls, 0.0)
                self._tstamps[key] = self.i
                w[cls] = w.get(cls, 0.0) + delta

    def average(self) -> None:
        """Replace weights with their training-time averages (the
        regularization that makes the perceptron usable)."""
        for f, per_cls in self.weights.items():
            for cls in list(per_cls):
                key = (f, cls)
                total = self._totals.get(key, 0.0) + (
                    self.i - self._tstamps.get(key, 0)
                ) * per_cls[cls]
                avg = round(total / max(self.i, 1), 6)
                if avg:
                    per_cls[cls] = avg
                else:
                    del per_cls[cls]
        self.weights = {f: pc for f, pc in self.weights.items() if pc}
        self._totals.clear()
        self._tstamps.clear()


def train(
    sentences: list[tuple[str, list[tuple[int, int, str]]]],
    n_iter: int = 8,
    seed: int = 0,
) -> AveragedPerceptron:
    """Train on (text, [(start_tok, end_tok_exclusive, LABEL), ...])
    whitespace-token annotations. Deterministic for a fixed seed."""
    import random

    labels = sorted({lab for _, ents in sentences for _, _, lab in ents})
    classes = ["O"] + [p + lab for lab in labels for p in ("B-", "I-")]
    model = AveragedPerceptron(classes)

    def bio(toks: list[str], ents: list[tuple[int, int, str]]) -> list[str]:
        tags = ["O"] * len(toks)
        for s, e, lab in ents:
            tags[s] = "B-" + lab
            for j in range(s + 1, e):
                tags[j] = "I-" + lab
        return tags

    data = [
        (text.split(" "), bio(text.split(" "), ents)) for text, ents in sentences
    ]
    rng = random.Random(seed)
    for _ in range(n_iter):
        rng.shuffle(data)
        for toks, tags in data:
            prev, prev2 = _START
            for i, truth in enumerate(tags):
                feats = _features(toks, i, prev, prev2)
                guess = model.predict(feats)
                model.update(truth, guess, feats)
                # teacher forcing: condition on the TRUE previous tag
                prev2, prev = prev, truth
    model.average()
    return model


class _Ent:
    """spaCy-Span-compatible surface: token start/end (end exclusive),
    surface text, label_."""

    __slots__ = ("start", "end", "text", "label_")

    def __init__(self, start: int, end: int, text: str, label: str):
        self.start, self.end, self.text, self.label_ = start, end, text, label


class _Doc:
    __slots__ = ("ents",)

    def __init__(self, ents: list[_Ent]):
        self.ents = ents


class MiniNER:
    """The minimal spaCy-``Language`` surface the N2 adapter consumes:
    ``pipe(texts, batch_size)`` yielding docs whose ``.ents`` carry
    token-indexed spans."""

    def __init__(self, model: AveragedPerceptron):
        self.model = model

    @classmethod
    def load(cls, path: str = WEIGHTS_PATH) -> "MiniNER":
        with open(path) as fh:
            blob = json.load(fh)
        m = AveragedPerceptron(blob["classes"])
        m.weights = blob["weights"]
        return cls(m)

    def _decode(self, text: str) -> _Doc:
        toks = text.split(" ")
        prev, prev2 = _START
        tags: list[str] = []
        for i in range(len(toks)):
            tag = self.model.predict(_features(toks, i, prev, prev2))
            # BIO constraint: I-X without a preceding B-X/I-X opens a span
            if tag.startswith("I-") and prev[2:] != tag[2:]:
                tag = "B-" + tag[2:]
            tags.append(tag)
            prev2, prev = prev, tag
        ents: list[_Ent] = []
        i = 0
        while i < len(tags):
            if tags[i].startswith("B-"):
                lab = tags[i][2:]
                j = i + 1
                while j < len(tags) and tags[j] == "I-" + lab:
                    j += 1
                ents.append(_Ent(i, j, " ".join(toks[i:j]), lab))
                i = j
            else:
                i += 1
        return _Doc(ents)

    def pipe(self, texts, batch_size: int = 64):
        for t in texts:
            yield self._decode(t or "")


def save_weights(model: AveragedPerceptron, path: str = WEIGHTS_PATH) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(
            {"classes": model.classes, "weights": model.weights},
            fh,
            sort_keys=True,
            separators=(",", ":"),
        )
        fh.write("\n")
