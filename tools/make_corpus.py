"""Deterministic training corpus generator (no-egress stand-in for the
reference's downloaded shakespeare.txt, rnn_text_generation.py:7-10).

A seeded grammar emits play-shaped text — scene headers, speaker turns,
templated lines over word banks — restricted to the reference's 66-char
vocab (utils/tokenizer.py). It has real structure for a character LM to
learn (names recur, grammar is regular, punctuation follows rules), so a
trained model's quantization Δtop-1/Δppl numbers are meaningful, while
being exactly reproducible from the seed.

    python tools/make_corpus.py [out.txt] [n_chars] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SPEAKERS = [
    "DUKE", "QUEEN", "HERALD", "GARDENER", "FALCONER", "CHANCELLOR",
    "FIRST WATCHMAN", "SECOND WATCHMAN", "MESSENGER", "ASTRONOMER",
]
NOUNS = [
    "crown", "river", "garden", "letter", "lantern", "horse", "castle",
    "storm", "harvest", "sword", "banner", "council", "road", "winter",
    "falcon", "tower", "feast", "oath", "shadow", "morning",
]
ADJS = [
    "silver", "weary", "ancient", "gentle", "bitter", "golden", "quiet",
    "broken", "distant", "faithful", "hollow", "crimson", "patient",
]
VERBS = [
    "carries", "forsakes", "remembers", "summons", "guards", "crosses",
    "defies", "heralds", "pardons", "crowns", "awaits", "betrays",
]
OPENERS = ["O", "Nay", "Hark", "Soft", "Peace", "Come", "Stay", "Go to"]

TEMPLATES = [
    "{opener}, the {adj} {noun} {verb} the {noun2}.",
    "What {noun} is this, that {verb} our {adj} {noun2}?",
    "My lord, the {noun} of {noun2} {verb} us all.",
    "I do beseech thee; let the {adj} {noun} be {adj2}.",
    "So {verb} the {noun}, and so the {noun2} falls.",
    "'Tis not the {noun} but the {adj} {noun2} I fear.",
    "Bring forth the {noun}; the {noun2} {verb} at dawn.",
]


def make_corpus(n_chars: int = 800_000, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)

    def pick(xs):
        return xs[int(rng.integers(len(xs)))]

    # the 66-char vocab contains no digits except '3' — number acts/scenes
    # in roman numerals (I, V, X are all in the vocab)
    romans = ["I", "II", "III", "IV", "V", "VI", "VII"]
    out = []
    total = 0
    act = 0
    while total < n_chars:
        scene = (f"ACT {romans[act % len(romans)]}, "
                 f"SCENE {romans[int(rng.integers(len(romans)))]}.\n\n")
        out.append(scene)
        total += len(scene)
        act += 1
        for _ in range(int(rng.integers(4, 9))):  # speaker turns per scene
            speaker = pick(SPEAKERS)
            lines = []
            for _ in range(int(rng.integers(1, 4))):
                noun, noun2 = pick(NOUNS), pick(NOUNS)
                t = pick(TEMPLATES).format(
                    opener=pick(OPENERS), adj=pick(ADJS), adj2=pick(ADJS),
                    noun=noun, noun2=noun2, verb=pick(VERBS),
                )
                lines.append(t)
            turn = f"{speaker}:\n" + "\n".join(lines) + "\n\n"
            out.append(turn)
            total += len(turn)
    return "".join(out)[:n_chars]


if __name__ == "__main__":
    out_path = sys.argv[1] if len(sys.argv) > 1 else "corpus.txt"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    text = make_corpus(n, seed)
    from ggml_experiments_tpu.utils.tokenizer import CharTokenizer

    tok = CharTokenizer()
    bad = sorted(set(text) - set(tok.vocab))
    assert not bad, f"chars outside the 66-char vocab: {bad}"
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {out_path}: {len(text):,} chars, {len(set(text))} distinct")
