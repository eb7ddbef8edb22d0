"""Adversarial + property-based hardening of the rebuilt LMX toolchain.

The reference shells out to the olimpic-icdar24 submodule for
linearization/delinearization/TEDn (reference:
acai_omr/inference/vitomr_inference.py:24-38,
acai_omr/train/omr_grpo_train.py:134-155); the submodule is an empty dir in
the snapshot, so the rebuild (acai_omr_tpu/lmx/) needs independent pressure
(VERDICT r1, item 4). This module provides:

* conformance over the 10 real LMX sequences shipped with the reference's
  sampled predictions (tests/data/lmx_corpus/, ground truths + model
  predictions) — clean delinearization and exact token round-trips,
* a seeded grammar-valid generator (60 streams: tuplets, grace notes, chords,
  multi-voice backup/forward, mid-measure attributes, ties/slurs/beams,
  articulations/ornaments/tremolos, whole-measure and invisible rests) with
  EXACT ``linearize(delinearize(s)) == s`` round-trips,
* canonical-form idempotence (``lin∘delin`` is a projection) under random
  token mutations of the real corpus,
* a 10k-stream token-soup crash fuzz over the full 227-token vocabulary
  (a delinearizer crash here would silently poison GRPO rewards and the
  serving postprocess), and
* differential TEDn tests against hand-computed Zhang-Shasha distances on
  non-trivial trees (not just the repo's own Python fallback).
"""

import random
import xml.etree.ElementTree as ET
from fractions import Fraction
from pathlib import Path

import pytest

from acai_omr_tpu.lmx import grammar as G
from acai_omr_tpu.lmx import tedn as tedn_lib
from acai_omr_tpu.lmx.delinearizer import (DelinearizationError, delinearize,
                                           delinearize_to_element)
from acai_omr_tpu.lmx.linearizer import _decompose_move, linearize

CORPUS = Path(__file__).parent / "data" / "lmx_corpus"
VOCAB = [t for t in (Path(__file__).parents[1] / "lmx_vocab.txt")
         .read_text().split() if t]


def corpus_files():
    return sorted(CORPUS.glob("*.txt"))


def load(path: Path) -> str:
    return path.read_text().replace("<eos>", "").strip()


def roundtrip(lmx: str) -> tuple[str, list]:
    root, errors = delinearize_to_element(lmx)
    return linearize(ET.tostring(root, encoding="unicode")), errors


# ---------------------------------------------------------------------------
# real-corpus conformance
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path", corpus_files(), ids=lambda p: p.stem)
def test_corpus_delinearizes_cleanly(path):
    lmx = load(path)
    root, errors = delinearize_to_element(lmx)
    assert errors == [], errors
    assert root.find("part/measure/note") is not None
    # TEDn of a sequence against its own delinearization is exactly zero
    xml = ET.tostring(root, encoding="unicode")
    cost, catastrophic, minor = tedn_lib.TEDn_lmx_xml(lmx, xml)
    assert (cost, catastrophic, minor) == (0.0, False, 0)


@pytest.mark.parametrize("path", corpus_files(), ids=lambda p: p.stem)
def test_corpus_roundtrip(path):
    """delinearize -> linearize reproduces the real token streams.

    Known canonicalization: a source note with no <staff> element inherits
    the voice's staff, so the re-linearized stream may move a ``staff:N``
    token to the voice's first note of the measure. Everything else must be
    token-exact, and the staff-token multiset must be preserved.
    """
    lmx = load(path)
    back, errors = roundtrip(lmx)
    assert errors == []
    a, b = lmx.split(), back.split()
    if a != b:
        strip = lambda ts: [t for t in ts if not t.startswith("staff:")]
        assert strip(a) == strip(b), "non-staff token divergence"
        assert sorted(t for t in a if t.startswith("staff:")) == \
            sorted(t for t in b if t.startswith("staff:"))
    # and the canonical form is a fixed point
    again, errors2 = roundtrip(back)
    assert errors2 == []
    assert again.split() == back.split()


# ---------------------------------------------------------------------------
# grammar-valid generator (canonical token order == linearizer emission order)
# ---------------------------------------------------------------------------

TYPE_Q = {"half": Fraction(2), "quarter": Fraction(1),
          "eighth": Fraction(1, 2), "16th": Fraction(1, 4)}
PITCHES = [f"{s}{o}" for o in (2, 3, 4, 5) for s in G.PITCH_STEPS]


class _Canon:
    """Mirror of the linearizer's per-measure sticky emission state
    (linearizer.py:62-68: voice resets per measure; stem/staff per voice)."""

    def reset(self):
        self.voice = None
        self.per_voice = {}

    def note(self, pitch, voice, *, typ=None, dots=0, acc=None, tm=None,
             stem=None, staff=None, beams=(), ties=(), tuplets=(), slurs=(),
             artic=(), orn=(), nots=(), grace=None, chord=False,
             visible=True):
        out = []
        if not visible:
            out.append("print-object:no")
        if grace:
            out.append(grace)
        if chord:
            out.append("chord")
        out.append(pitch)
        if voice != self.voice:
            self.voice = voice
            out.append(f"voice:{voice}")
        vs = self.per_voice.setdefault(voice, {"stem": None, "staff": None})
        if typ:
            out.append(typ)
        out.extend(["dot"] * dots)
        if acc:
            out.append(acc)
        if tm:
            out.append(tm)
        rest = pitch in ("rest", "rest:measure")
        if stem is not None and not rest and stem != vs["stem"]:
            vs["stem"] = stem
            out.append(f"stem:{stem}")
        if staff is not None and staff != vs["staff"]:
            vs["staff"] = staff
            out.append(f"staff:{staff}")
        out.extend(beams)
        for t in ("start", "stop"):
            if t in ties:
                out.append(f"tied:{t}")
        out.extend(f"tuplet:{t}" for t in tuplets)
        out.extend(f"slur:{s}" for s in slurs)
        if "fermata" in nots:
            out.append("fermata")
        if "arpeggiate" in nots:
            out.append("arpeggiate")
        out.extend(artic)
        out.extend(orn)
        return out


def _move_tokens(kind: str, quarters: Fraction) -> list[str]:
    toks = []
    for chunk in _decompose_move(quarters):
        toks.append(kind)
        toks.extend(chunk)
    return toks


def _fill_events(rng: random.Random, quarters: Fraction) -> list[dict]:
    """Events with exact total duration == quarters."""
    events = []
    rem = quarters
    while rem > 0:
        roll = rng.random()
        if roll < 0.15 and rem >= 1:
            events.append({"kind": "triplet"})  # 3 tuplet eighths = 1 quarter
            rem -= 1
            continue
        fits = [(t, q) for t, q in TYPE_Q.items() if q <= rem]
        typ, q = rng.choice(fits)
        dots = 0
        # dots only on >= eighth so the remainder stays a multiple of 1/4
        if (rng.random() < 0.25 and q >= Fraction(1, 2)
                and q * Fraction(3, 2) <= rem):
            dots, q = 1, q * Fraction(3, 2)
        kind = rng.choices(["note", "chord", "rest"], [0.6, 0.2, 0.2])[0]
        events.append({"kind": kind, "typ": typ, "dots": dots})
        rem -= q
    return events


def _emit_voice(rng, canon, voice, staff, events):
    """Canonical tokens for one voice's measure content; returns tokens."""
    toks = []
    stem = rng.choice(["up", "down"])
    pitched = [i for i, e in enumerate(events) if e["kind"] != "rest"]
    tie_at = slur_at = None
    if len(pitched) >= 2 and rng.random() < 0.4:
        tie_at = tuple(rng.sample(pitched, 2))
    if len(pitched) >= 2 and rng.random() < 0.4:
        slur_at = tuple(sorted(rng.sample(pitched, 2)))

    for i, ev in enumerate(events):
        ties, slurs = [], []
        if tie_at:
            ties = (["start"] if i == min(tie_at) else
                    ["stop"] if i == max(tie_at) else [])
        if slur_at:
            slurs = (["start"] if i == slur_at[0] else
                     ["stop"] if i == slur_at[1] else [])
        if ev["kind"] == "triplet":
            for j in range(3):
                beams = (["beam:begin"] if j == 0 else
                         ["beam:end"] if j == 2 else [])
                tuplets = (["start"] if j == 0 else
                           ["stop"] if j == 2 else [])
                toks += canon.note(rng.choice(PITCHES), voice, typ="eighth",
                                   tm="3in2", stem=stem, staff=staff,
                                   beams=beams, tuplets=tuplets)
            continue
        if ev["kind"] == "rest":
            toks += canon.note("rest", voice, typ=ev["typ"], dots=ev["dots"],
                               staff=staff)
            continue
        if rng.random() < 0.12:  # grace prefix (no duration)
            toks += canon.note(rng.choice(PITCHES), voice,
                               typ=rng.choice(["eighth", "16th"]),
                               stem=stem, staff=staff,
                               grace=rng.choice(["grace", "grace:slash"]))
        acc = (rng.choice(sorted(G.ACCIDENTALS)) if rng.random() < 0.2
               else None)
        artic = (rng.sample(sorted(G.ARTICULATIONS), 2)
                 if rng.random() < 0.15 else [])
        orn = (["trill-mark"] if rng.random() < 0.08 else
               ["tremolo:start", "tremolo:3"] if rng.random() < 0.05 else [])
        nots = (["fermata"] if rng.random() < 0.06 else
                ["arpeggiate"] if rng.random() < 0.06 else [])
        if rng.random() < 0.2:  # flip stem mid-measure
            stem = "up" if stem == "down" else "down"
        toks += canon.note(rng.choice(PITCHES), voice, typ=ev["typ"],
                           dots=ev["dots"], acc=acc, stem=stem, staff=staff,
                           ties=ties, slurs=slurs, artic=artic, orn=orn,
                           nots=nots)
        if ev["kind"] == "chord":
            for _ in range(rng.randint(1, 2)):
                toks += canon.note(rng.choice(PITCHES), voice, typ=ev["typ"],
                                   dots=ev["dots"], stem=stem, staff=staff,
                                   chord=True)
    return toks


def generate_lmx(seed: int) -> str:
    """One random grammar-valid pianoform stream in canonical token order."""
    rng = random.Random(seed)
    canon = _Canon()
    toks: list[str] = []
    beats, beat_type = rng.choice([(2, 4), (3, 4), (4, 4), (6, 8), (3, 8)])
    measure_q = Fraction(beats * 4, beat_type)

    for mi in range(rng.randint(1, 4)):
        toks.append("measure")
        canon.reset()
        if mi == 0:
            toks += [f"key:fifths:{rng.randint(-4, 4)}", "time",
                     f"beats:{beats}", f"beat-type:{beat_type}",
                     "clef:G2", "staff:1", "clef:F4", "staff:2"]
        elif rng.random() < 0.3:  # measure-start attribute change
            toks.append(f"key:fifths:{rng.randint(-4, 4)}")

        if rng.random() < 0.1:  # whole-measure rests on both staves
            toks += canon.note("rest:measure", "1", staff="1")
            toks += _move_tokens("backup", measure_q)
            toks += canon.note("rest:measure", "5", staff="2")
            continue

        v1 = _fill_events(rng, measure_q)
        toks += _emit_voice(rng, canon, "1", "1", v1)
        if rng.random() < 0.25:  # mid-measure attribute change
            toks.append(f"key:fifths:{rng.randint(-4, 4)}")
            if rng.random() < 0.5:
                toks += ["clef:C3", "staff:1"]
        toks += _move_tokens("backup", measure_q)
        if rng.random() < 0.2:  # invisible pad rest after the backup
            toks += canon.note("rest", "5", typ="quarter", staff="2",
                               visible=False)
            toks += _emit_voice(rng, canon, "5", "2",
                                _fill_events(rng, measure_q - 1))
        elif rng.random() < 0.2:  # forward move instead of leading content
            fwd = Fraction(1)
            toks += _move_tokens("forward", fwd)
            toks += _emit_voice(rng, canon, "5", "2",
                                _fill_events(rng, measure_q - fwd))
        else:
            toks += _emit_voice(rng, canon, "5", "2",
                                _fill_events(rng, measure_q))
    return " ".join(toks)


@pytest.mark.parametrize("seed", range(60))
def test_generated_streams_roundtrip_exactly(seed):
    lmx = generate_lmx(seed)
    back, errors = roundtrip(lmx)
    assert errors == [], (errors, lmx)
    assert back.split() == lmx.split(), lmx
    # vocabulary closure: every generated token is in the real vocab
    assert set(lmx.split()) <= set(VOCAB)


def test_generated_corpus_is_diverse():
    """The 60 generated streams jointly exercise every targeted feature."""
    blob = " ".join(generate_lmx(s) for s in range(60)).split()
    for tok in ["3in2", "tuplet:start", "grace", "grace:slash", "chord",
                "backup", "forward", "rest:measure", "print-object:no",
                "tied:start", "slur:start", "beam:begin", "trill-mark",
                "tremolo:start", "fermata", "arpeggiate", "staccato",
                "voice:5", "clef:C3", "dot"]:
        assert tok in blob, f"feature never generated: {tok}"
    assert blob.count("measure") >= 100


# ---------------------------------------------------------------------------
# fuzzing
# ---------------------------------------------------------------------------

def test_token_soup_never_crashes():
    """10k random streams over the full vocabulary: the delinearizer must
    return or raise DelinearizationError — never anything else (reference
    reward seam: omr_grpo_train.py:134-155 treats only catastrophic/minor)."""
    rng = random.Random(0xACA1)
    catastrophic = 0
    for _ in range(10_000):
        n = rng.randint(0, 48)
        stream = " ".join(rng.choice(VOCAB) for _ in range(n))
        try:
            delinearize_to_element(stream)
        except DelinearizationError:
            catastrophic += 1
    assert catastrophic > 0  # empty/measure-less streams are in the sample


@pytest.mark.slow
def test_corpus_mutation_fuzz():
    """2k random mutants of the real sequences: no crashes, and the reward
    path (TEDn vs the clean target) stays finite and non-catastrophic for
    streams that still parse."""
    rng = random.Random(7)
    files = corpus_files()
    targets = {f: delinearize(load(f))[0] for f in files
               if f.stem.startswith("target")}
    for _ in range(2_000):
        f = rng.choice(files)
        toks = load(f).split()
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(4)
            i = rng.randrange(len(toks))
            if op == 0:
                del toks[i]
            elif op == 1:
                toks.insert(i, rng.choice(VOCAB))
            elif op == 2:
                toks[i] = rng.choice(VOCAB)
            else:
                j = rng.randrange(len(toks))
                toks[i], toks[j] = toks[j], toks[i]
        mutant = " ".join(toks)
        try:
            delinearize_to_element(mutant)
        except DelinearizationError:
            continue
        target_xml = targets[rng.choice(sorted(targets))]
        cost, catastrophic, minor = tedn_lib.TEDn_lmx_xml(mutant, target_xml)
        assert cost >= 0 and cost == cost  # finite, non-NaN
        assert not catastrophic
        assert minor >= 0


def test_mutants_canonicalize_to_fixed_point():
    """lin∘delin is a projection: one pass lands on the canonical form."""
    rng = random.Random(11)
    checked = 0
    for _ in range(300):
        f = rng.choice(corpus_files())
        toks = load(f).split()
        for _ in range(rng.randint(1, 4)):
            i = rng.randrange(len(toks))
            if rng.random() < 0.5:
                del toks[i]
            else:
                toks[i] = rng.choice(VOCAB)
        try:
            c1, _ = roundtrip(" ".join(toks))
            c2, _ = roundtrip(c1)
        except DelinearizationError:
            continue
        assert c2.split() == c1.split()
        checked += 1
    assert checked >= 200


def test_dotted_moves_roundtrip():
    """Regression: 'backup half dot' is 3 quarters (a dot adds half of the
    previous increment), matching the linearizer's greedy dot absorption."""
    lmx = ("measure time beats:4 beat-type:4 clef:G2 C4 voice:1 half dot "
           "backup half dot C3 voice:2 half dot")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    m = root.find("part/measure")
    div = int(m.find("attributes/divisions").text)
    assert int(m.find("backup/duration").text) == 3 * div
    back, _ = roundtrip(lmx)
    assert back.split() == lmx.split()


def test_print_object_attaches_to_following_note():
    """Regression: print-object:no prefixes the note it modifies."""
    lmx = ("measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter "
           "print-object:no rest quarter D4 half")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    notes = root.findall("part/measure/note")
    assert notes[0].get("print-object") is None
    assert notes[1].get("print-object") == "no"
    back, _ = roundtrip(lmx)
    assert back.split() == lmx.split()


# ---------------------------------------------------------------------------
# TEDn vs hand-computed Zhang-Shasha distances
# ---------------------------------------------------------------------------

def _tree(spec):
    """('label', [children...]) -> ET.Element."""
    label, children = spec if isinstance(spec, tuple) else (spec, [])
    el = ET.Element(label)
    for c in children:
        el.append(_tree(c))
    return el


# (tree_a, tree_b, hand-computed distance, why)
TED_CASES = [
    (("a", ["b", "c"]), ("a", ["b", "c"]), 0, "identical"),
    (("a", ["b", "c"]), ("a", ["b", "x"]), 1, "relabel one leaf"),
    (("a", ["b", "c"]), ("x", ["b", "c"]), 1, "relabel root"),
    (("a", ["b", "c"]), ("a", ["b"]), 1, "delete one leaf"),
    (("a", [("b", ["c"])]), ("a", ["b"]), 1, "delete chain tail"),
    (("a", [("b", ["c"])]), ("a", [("x", ["c"])]), 1, "relabel mid-chain"),
    # Zhang & Shasha's classic example (1989, fig. 4):
    # f(d(a c(b)) e) -> f(c(d(a b)) e) = 2 (delete c, insert c higher)
    (("f", [("d", ["a", ("c", ["b"])]), "e"]),
     ("f", [("c", [("d", ["a", "b"])]), "e"]), 2, "zhang-shasha fig. 4"),
    # star growth: insert two new leaves
    (("r", ["a", "b", "c"]), ("r", ["a", "b", "c", "d", "e"]), 2,
     "insert two leaves"),
    # fully disjoint stars: relabel root + min(3,5) leaf relabels impossible —
    # relabel root (1) + relabel 3 leaves (3) + insert 2 leaves (2) = 6
    (("r", ["x1", "x2", "x3"]), ("s", ["y1", "y2", "y3", "y4", "y5"]), 6,
     "disjoint stars"),
    # restructure: flatten a chain into a star:
    # a(b(c(d))) -> a(b c d): delete edges by moving c,d up = 0 relabels,
    # ZS distance: delete c? keep labels: chain a-b-c-d vs star a(b,c,d).
    # Optimal: 2 (delete c and d from the chain, insert c and d as siblings
    # is 4; better: keyroot mapping keeps a,b,c,d labels but tree shape
    # changes need... hand-derived below) — see test body instead.
]


@pytest.mark.parametrize("a,b,want,why", TED_CASES,
                         ids=[c[3] for c in TED_CASES])
def test_tedn_hand_computed(a, b, want, why):
    assert tedn_lib.tree_edit_distance(_tree(a), _tree(b)) == want


@pytest.mark.parametrize("a,b,want,why", TED_CASES,
                         ids=[c[3] for c in TED_CASES])
def test_tedn_python_fallback_hand_computed(a, b, want, why):
    """The pure-Python Zhang-Shasha agrees with the hand computations too
    (so native and fallback are each independently validated)."""
    intern = {}
    la, lla = tedn_lib.element_to_postorder(_tree(a), intern)
    lb, llb = tedn_lib.element_to_postorder(_tree(b), intern)
    assert tedn_lib._py_ted(la, lla, lb, llb) == want


def test_tedn_symmetry_and_triangle():
    """Metric sanity on real musical trees: d(a,b)=d(b,a), identity, and the
    triangle inequality across three corpus delinearizations."""
    trees = []
    for f in corpus_files()[:3]:
        root, _ = delinearize_to_element(load(f))
        trees.append(tedn_lib._score_tree(root))
    for t in trees:
        assert tedn_lib.tree_edit_distance(t, t) == 0
    d01 = tedn_lib.tree_edit_distance(trees[0], trees[1])
    d10 = tedn_lib.tree_edit_distance(trees[1], trees[0])
    d12 = tedn_lib.tree_edit_distance(trees[1], trees[2])
    d02 = tedn_lib.tree_edit_distance(trees[0], trees[2])
    assert d01 == d10 > 0
    assert d02 <= d01 + d12
