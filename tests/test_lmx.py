"""LMX linearization / delinearization / TEDn tests.

Fixture sequences in tests/data are real LMX target sequences from the
reference's sampled predictions (ground-truth GrandStaff/OLiMPiC encodings) —
used as grammar conformance inputs.
"""

import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np
import pytest

from acai_omr_tpu.lmx import tedn as tedn_lib
from acai_omr_tpu.lmx.delinearizer import (DelinearizationError, delinearize,
                                           delinearize_to_element)
from acai_omr_tpu.lmx.linearizer import linearize

DATA = Path(__file__).parent / "data"


def load_sample(i):
    text = (DATA / f"sample_lmx_{i}.txt").read_text().strip()
    return text.replace("<eos>", "").strip()


@pytest.mark.parametrize("i", [0, 1])
def test_delinearize_real_sequences(i):
    lmx = load_sample(i)
    root, errors = delinearize_to_element(lmx)
    assert errors == [], errors
    assert root.tag == "score-partwise"
    part = root.find("part")
    measures = part.findall("measure")
    assert len(measures) == lmx.split().count("measure")
    # first measure declares divisions, key, time, staves, both clefs
    attrs = measures[0].find("attributes")
    assert attrs.find("divisions") is not None
    assert attrs.find("key/fifths") is not None
    assert attrs.find("time/beats") is not None
    assert int(attrs.find("staves").text) == 2
    assert len(attrs.findall("clef")) == 2
    # notes carry pitch + duration + type
    note = part.find("measure/note")
    assert note.find("pitch/step") is not None
    assert note.find("duration") is not None


@pytest.mark.parametrize("i", [0, 1])
def test_roundtrip_linearize(i):
    """delinearize -> linearize reproduces the token stream exactly."""
    lmx = load_sample(i)
    root, _ = delinearize_to_element(lmx)
    back = linearize(ET.tostring(root, encoding="unicode"))
    assert back.split() == lmx.split()


def test_measure_voice_time_consistency():
    lmx = load_sample(0)
    root, _ = delinearize_to_element(lmx)
    # 3/4 time: voice-1 content of measure 1 must sum to 3 quarters of divisions
    attrs = root.find("part/measure/attributes")
    div = int(attrs.find("divisions").text)
    m1 = root.find("part/measure")
    total = 0
    for note in m1.findall("note"):
        if note.find("chord") is None and (note.find("voice") is None or
                                           note.find("voice").text == "1"):
            if note.find("voice") is not None and note.find("voice").text != "1":
                continue
            d = note.find("duration")
            if d is not None and (note.find("voice") is None or note.find("voice").text == "1"):
                total += int(d.text)
    # voice 1: six eighths = 3 quarters
    assert total == 3 * div


def test_alter_reconstruction():
    """key:fifths:-1 -> B gets alter -1 without printed accidental; printed
    natural cancels within the measure."""
    lmx = ("measure key:fifths:-1 time beats:4 beat-type:4 clef:G2 "
           "B4 voice:1 quarter B4 quarter natural B4 quarter A4 quarter")
    root, errors = delinearize_to_element(lmx)
    notes = root.findall("part/measure/note")
    # first B4: flat from key signature
    assert notes[0].find("pitch/alter").text == "-1"
    # second B4: printed natural -> no alter element
    assert notes[1].find("pitch/alter") is None
    # third B4 inherits the in-measure natural
    assert notes[2].find("pitch/alter") is None
    # A4 unaffected by key
    assert notes[3].find("pitch/alter") is None


def test_backup_accumulation():
    lmx = ("measure time beats:3 beat-type:4 clef:F4 C3 voice:1 half dot "
           "backup half backup quarter C2 voice:2 half dot")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    m = root.find("part/measure")
    div = int(m.find("attributes/divisions").text)
    backups = m.findall("backup")
    assert len(backups) == 2
    assert int(backups[0].find("duration").text) == 2 * div
    assert int(backups[1].find("duration").text) == 1 * div


def test_rest_measure_duration_follows_time():
    lmx = "measure time beats:6 beat-type:8 clef:G2 rest:measure voice:1"
    root, _ = delinearize_to_element(lmx)
    m = root.find("part/measure")
    div = int(m.find("attributes/divisions").text)
    note = m.find("note")
    assert note.find("rest").get("measure") == "yes"
    assert int(note.find("duration").text) == 3 * div  # 6/8 = 3 quarters


def test_catastrophic_and_minor_errors():
    with pytest.raises(DelinearizationError):
        delinearize_to_element("")
    # stray modifier tokens are minor errors, not fatal
    root, errors = delinearize_to_element("measure clef:G2 dot sharp C4 voice:1 quarter")
    assert len(errors) == 2
    assert root.find("part/measure/note") is not None


def test_tuplet_time_modification():
    lmx = ("measure time beats:4 beat-type:4 clef:G2 "
           "C4 voice:1 eighth 3in2 tuplet:start D4 eighth 3in2 E4 eighth 3in2 tuplet:stop")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    notes = root.findall("part/measure/note")
    div = int(root.find("part/measure/attributes/divisions").text)
    # triplet eighth = 1/3 quarter
    assert int(notes[0].find("duration").text) == div // 3
    tm = notes[0].find("time-modification")
    assert tm.find("actual-notes").text == "3"
    assert notes[0].find("notations/tuplet").get("type") == "start"


# ---------------------------------------------------------------------------
# TEDn
# ---------------------------------------------------------------------------

def test_tedn_identity_zero():
    lmx = load_sample(0)
    xml, _ = delinearize(lmx)
    cost, catastrophic, minor = tedn_lib.TEDn_lmx_xml(lmx, xml)
    assert cost == 0.0 and not catastrophic and minor == 0


def test_tedn_detects_differences():
    lmx = load_sample(0)
    xml, _ = delinearize(lmx)
    toks = lmx.split()
    # change one pitch
    idx = toks.index("F4")
    toks[idx] = "G4"
    cost1, cat, _ = tedn_lib.TEDn_lmx_xml(" ".join(toks), xml)
    assert not cat and 0 < cost1 <= 4
    # dropping a whole measure costs much more
    cut = " ".join(lmx.split()[:len(toks) // 2])
    cost2, cat, _ = tedn_lib.TEDn_lmx_xml(cut, xml)
    assert not cat and cost2 > cost1


def test_tedn_catastrophic_on_garbage():
    xml, _ = delinearize(load_sample(0))
    cost, catastrophic, minor = tedn_lib.TEDn_lmx_xml("", xml)
    assert catastrophic
    assert cost == float(tedn_lib.tree_size(
        tedn_lib._score_tree(ET.fromstring(xml))))


def test_native_matches_python_ted(rng):
    """C++ kernel ≡ pure-Python Zhang-Shasha on random trees."""
    if tedn_lib._load_native() is None:
        pytest.skip("native kernel not built")

    def random_tree(rng, n_nodes):
        root = ET.Element(f"n{rng.integers(0, 5)}")
        nodes = [root]
        for _ in range(n_nodes - 1):
            parent = nodes[rng.integers(0, len(nodes))]
            child = ET.SubElement(parent, f"n{rng.integers(0, 5)}")
            nodes.append(child)
        return root

    for trial in range(10):
        a = random_tree(rng, int(rng.integers(2, 30)))
        b = random_tree(rng, int(rng.integers(2, 30)))
        intern = {}
        la, lla = tedn_lib.element_to_postorder(a, intern)
        lb, llb = tedn_lib.element_to_postorder(b, intern)
        import ctypes
        lib = tedn_lib._load_native()
        native = int(lib.tree_edit_distance(
            len(la), la.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lla.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(lb), lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            llb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))
        py = tedn_lib._py_ted(la, lla, lb, llb)
        assert native == py, (trial, native, py)


def test_grace_notes_and_ornaments():
    # canonical notation-token order: fermata/arpeggiate, articulations,
    # ornaments (delinearizer accepts any order; linearizer emits this one)
    lmx = ("measure time beats:4 beat-type:4 clef:G2 "
           "grace C5 voice:1 eighth stem:up D5 quarter fermata trill-mark "
           "grace:slash E5 16th F5 quarter arpeggiate staccato accent "
           "G5 quarter tremolo:start tremolo:3 A5 quarter tremolo:stop")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    notes = root.findall("part/measure/note")
    # grace note: <grace/>, no duration
    assert notes[0].find("grace") is not None
    assert notes[0].find("duration") is None
    assert notes[1].find("notations/ornaments/trill-mark") is not None
    assert notes[1].find("notations/fermata") is not None
    assert notes[2].find("grace").get("slash") == "yes"
    art = notes[3].find("notations/articulations")
    assert art.find("staccato") is not None and art.find("accent") is not None
    assert notes[3].find("notations/arpeggiate") is not None
    trem = notes[4].find("notations/ornaments/tremolo")
    assert trem.get("type") == "start"
    # round-trip all of it
    back = linearize(ET.tostring(root, encoding="unicode"))
    assert back.split() == lmx.split()


def test_forward_element_and_mid_measure_attributes():
    lmx = ("measure time beats:4 beat-type:4 clef:G2 C4 voice:1 quarter "
           "forward quarter D4 quarter "
           "measure key:fifths:2 time beats:3 beat-type:8 E4 voice:1 eighth")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    m1, m2 = root.findall("part/measure")
    fwd = m1.find("forward")
    div = int(m1.find("attributes/divisions").text)
    assert int(fwd.find("duration").text) == div
    # measure 2 carries a new key + time
    assert m2.find("attributes/key/fifths").text == "2"
    assert m2.find("attributes/time/beat-type").text == "8"
    # rest:measure after a time change follows the new signature
    lmx3 = lmx + " measure rest:measure"
    root3, _ = delinearize_to_element(lmx3)
    m3 = root3.findall("part/measure")[2]
    div3 = int(root3.find("part/measure/attributes/divisions").text)
    # 3/8 = 1.5 quarters
    assert int(m3.find("note/duration").text) == int(1.5 * div3)


def test_linearizer_drops_out_of_vocab_gracefully():
    """Continue beams and unpitched elements have no LMX tokens; the
    linearizer must skip them without corrupting the stream."""
    xml = """<score-partwise><part-list><score-part id="P1"/></part-list>
    <part id="P1"><measure number="1">
      <attributes><divisions>2</divisions>
        <time><beats>4</beats><beat-type>4</beat-type></time>
        <clef><sign>G</sign><line>2</line></clef></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>1</duration>
        <voice>1</voice><type>eighth</type><beam number="1">begin</beam></note>
      <note><pitch><step>D</step><octave>4</octave></pitch><duration>1</duration>
        <voice>1</voice><type>eighth</type><beam number="1">continue</beam></note>
      <note><pitch><step>E</step><octave>4</octave></pitch><duration>1</duration>
        <voice>1</voice><type>eighth</type><beam number="1">end</beam></note>
    </measure></part></score-partwise>"""
    out = linearize(xml)
    toks = out.split()
    assert toks.count("beam:begin") == 1
    assert toks.count("beam:end") == 1
    assert "continue" not in out
    # stream still delinearizes cleanly
    root, errors = delinearize_to_element(out)
    assert errors == []
    assert len(root.findall("part/measure/note")) == 3


def test_tedn_native_speed_sane():
    """The C++ kernel scores a realistic pair quickly (sanity perf check)."""
    import time
    if tedn_lib._load_native() is None:
        pytest.skip("native kernel not built")
    lmx = load_sample(0)
    xml, _ = delinearize(lmx)
    t0 = time.perf_counter()
    for _ in range(5):
        cost, cat, _ = tedn_lib.TEDn_lmx_xml(lmx, xml)
    dt = (time.perf_counter() - t0) / 5
    assert cost == 0.0
    assert dt < 1.0, f"TEDn too slow: {dt:.2f}s per call"


# ---------------------------------------------------------------------------
# Independent exact-TED oracle (VERDICT: a subtle TED bug would silently skew
# every GRPO reward — reference omr_grpo_train.py:15 TEDn_lmx_xml backbone).
# The oracle is a from-first-principles recursive ordered-forest edit
# distance (exponential with memoization, tiny trees only), sharing no code
# or algorithmic structure with the Zhang-Shasha implementations it checks.
# ---------------------------------------------------------------------------

def _brute_forest_ed(f1, f2, memo):
    """Exact edit distance between ordered forests of (label, children) tuples.

    Unit costs; rename cost 0/1. Textbook recursion on the rightmost roots:
    delete v (children splice into the forest), insert w, or match the two
    rightmost subtrees (roots paired, child forests compared recursively).
    """
    key = (f1, f2)
    if key in memo:
        return memo[key]

    def forest_size(f):
        return sum(1 + forest_size(c) for (_, c) in f)

    if not f1:
        r = forest_size(f2)
    elif not f2:
        r = forest_size(f1)
    else:
        (la, ca), (lb, cb) = f1[-1], f2[-1]
        delete = _brute_forest_ed(f1[:-1] + ca, f2, memo) + 1
        insert = _brute_forest_ed(f1, f2[:-1] + cb, memo) + 1
        match = (_brute_forest_ed(f1[:-1], f2[:-1], memo)
                 + _brute_forest_ed(ca, cb, memo)
                 + (0 if la == lb else 1))
        r = min(delete, insert, match)
    memo[key] = r
    return r


def _random_tuple_tree(rng, n_nodes, n_labels):
    """Random ordered tree as nested (label, children) tuples + the same
    tree as an ET.Element (for the public tree_edit_distance path)."""
    labels = [f"n{rng.integers(0, n_labels)}" for _ in range(n_nodes)]
    children = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        children[int(rng.integers(0, i))].append(i)

    def tup(i):
        return (labels[i], tuple(tup(c) for c in children[i]))

    def elem(i, parent=None):
        el = ET.Element(labels[i]) if parent is None else ET.SubElement(parent, labels[i])
        for c in children[i]:
            elem(c, el)
        return el

    return tup(0), elem(0)


def test_ted_matches_brute_force_oracle(rng):
    """Property test: Zhang-Shasha (native C++ when built, else the Python
    fallback — tree_edit_distance picks automatically) equals the independent
    brute-force exact TED on ~1000 random tiny tree pairs, including
    single-node and heavily-renamed cases."""
    mismatches = []
    for trial in range(1000):
        na = int(rng.integers(1, 9))
        nb = int(rng.integers(1, 9))
        n_labels = int(rng.integers(1, 4)) if trial % 3 else 8
        ta, ea = _random_tuple_tree(rng, na, n_labels)
        tb, eb = _random_tuple_tree(rng, nb, n_labels)
        expect = _brute_forest_ed((ta,), (tb,), {})
        got = tedn_lib.tree_edit_distance(ea, eb)
        if got != expect:
            mismatches.append((trial, expect, got, ta, tb))
    assert not mismatches, mismatches[:3]


def test_ted_oracle_pure_python_path(rng):
    """Same oracle against the pure-Python Zhang-Shasha fallback explicitly
    (covers deployments without the native kernel)."""
    for trial in range(200):
        ta, ea = _random_tuple_tree(rng, int(rng.integers(1, 8)), 3)
        tb, eb = _random_tuple_tree(rng, int(rng.integers(1, 8)), 3)
        intern = {}
        la, lla = tedn_lib.element_to_postorder(ea, intern)
        lb, llb = tedn_lib.element_to_postorder(eb, intern)
        expect = _brute_forest_ed((ta,), (tb,), {})
        assert tedn_lib._py_ted(la, lla, lb, llb) == expect, (trial, ta, tb)


def test_delinearize_divisions_without_leading_attributes():
    """A first measure with no key/time/clef tokens must still declare
    <divisions> (consumers default divisions=1 and misread durations)."""
    from acai_omr_tpu.lmx.delinearizer import delinearize

    xml, errs = delinearize("measure C4 eighth D4 eighth")
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml)
    div = root.find(".//measure/attributes/divisions")
    assert div is not None and int(div.text) >= 2, xml


def test_tremolo_type_value_roundtrip():
    """'tremolo:start tremolo:3' is ONE <tremolo type="start">3</tremolo>
    element (the linearizer's emission), not two."""
    from acai_omr_tpu.lmx.delinearizer import delinearize
    from acai_omr_tpu.lmx.linearizer import linearize

    lmx = "measure time beats:4 beat-type:4 clef:G2 C4 quarter tremolo:start tremolo:3"
    xml, errs = delinearize(lmx)
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml)
    trems = root.findall(".//ornaments/tremolo")
    assert len(trems) == 1, xml
    assert trems[0].get("type") == "start" and trems[0].text == "3"
    # and the round trip re-linearizes to the same token pair
    assert "tremolo:start tremolo:3" in linearize(xml)


def test_linearize_senza_misura_time():
    """<time><senza-misura/></time> emits no time tokens instead of
    crashing."""
    from acai_omr_tpu.lmx.linearizer import linearize

    xml = """<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>1</divisions><time><senza-misura/></time>
      <clef><sign>G</sign><line>2</line></clef></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch>
      <duration>1</duration><type>quarter</type></note>
    </measure></part></score-partwise>"""
    out = linearize(xml)
    assert "time" not in out.split() and "C4" in out.split(), out


# ---------------------------------------------------------------------------
# round-5 review regressions (accidental staffing, tie order, parser
# robustness — each was empirically confirmed against the pre-fix code)
# ---------------------------------------------------------------------------

def test_accidental_state_is_per_staff():
    """A printed accidental on staff 1 must NOT alter the same pitch on
    staff 2 of a grand staff (MusicXML accidentals apply per staff; the
    old (step, octave) key contaminated cross-staff pitches and charged
    TEDn edits against token-perfect rollouts)."""
    lmx = ("measure clef:G2 staff:1 clef:F4 staff:2 "
           "C5 voice:1 quarter sharp stem:up staff:1 "
           "backup quarter "
           "C5 voice:2 quarter stem:down staff:2")
    root, errors = delinearize_to_element(lmx)
    assert errors == []
    notes = root.findall("part/measure/note")
    alters = [n.findtext("pitch/alter") for n in notes]
    assert alters[0] == "1"          # printed sharp on staff 1
    assert alters[1] is None, alters  # staff 2 C5 is natural
    # and the SAME staff still inherits the accidental within the measure
    lmx2 = ("measure clef:G2 C5 voice:1 quarter sharp stem:up "
            "C5 voice:1 quarter stem:up")
    root2, errs2 = delinearize_to_element(lmx2)
    assert errs2 == []
    alters2 = [n.findtext("pitch/alter")
               for n in root2.findall("part/measure/note")]
    assert alters2 == ["1", "1"]


def test_tie_tokens_preserve_document_order():
    """Mid-tie notes carry <tie type="stop"/><tie type="start"/> in that
    document order; canonicalizing to (start, stop) charged 4 TEDn edits
    per mid-tie note on token-perfect output."""
    xml = """<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>1</divisions>
        <time><beats>4</beats><beat-type>4</beat-type></time>
        <clef><sign>G</sign><line>2</line></clef></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>4</duration>
        <tie type="stop"/><tie type="start"/>
        <voice>1</voice><type>whole</type>
        <notations><tied type="stop"/><tied type="start"/></notations></note>
    </measure></part></score-partwise>"""
    toks = linearize(xml).split()
    i_stop, i_start = toks.index("tied:stop"), toks.index("tied:start")
    assert i_stop < i_start, toks
    cost, catastrophic, _ = tedn_lib.TEDn_lmx_xml(linearize(xml), xml)
    assert not catastrophic
    assert cost == 0.0, cost


def test_linearizer_skips_out_of_vocab_clef_and_compound_time():
    """percussion/TAB clefs and compound ('3+2') time signatures have no
    vocab tokens: skip them (like other out-of-vocab elements) instead of
    crashing linearize()."""
    xml = """<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>1</divisions>
        <time><beats>3+2</beats><beat-type>8</beat-type></time>
        <clef><sign>percussion</sign></clef></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>1</duration>
        <voice>1</voice><type>quarter</type></note>
    </measure></part></score-partwise>"""
    toks = linearize(xml).split()
    assert "time" not in toks and not any(t.startswith("clef:") for t in toks)
    assert "C4" in toks


def test_delinearizer_malformed_structured_tokens_are_minor():
    """Malformed structured tokens (reachable via the public API/CLI, not
    from vocab-constrained decode) must be MINOR errors per the documented
    contract — the old IndexError/ValueError escaped TEDn's catastrophic
    catch and crashed whole reward pools."""
    for bad in ("measure clef:G C4 voice:1 quarter",
                "measure beats:x C4 voice:1 quarter",
                "measure key:fifths: C4 voice:1 quarter",
                "measure time beats:3 beat-type:zz C4 voice:1 quarter"):
        root, errors = delinearize_to_element(bad)
        assert errors, bad  # flagged, not crashed
        assert len(root.findall("part/measure/note")) == 1, bad
    # and TEDn scores such input instead of raising
    gold = """<score-partwise><part id="P1"><measure number="1">
      <attributes><divisions>1</divisions></attributes>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>1</duration>
        <voice>1</voice><type>quarter</type></note>
    </measure></part></score-partwise>"""
    cost, catastrophic, minor = tedn_lib.TEDn_lmx_xml(
        "measure clef:G C4 voice:1 quarter", gold)
    assert np.isfinite(cost)


def test_stale_beats_cannot_fabricate_time_signature():
    """After a complete time pair is consumed, a later stray beat-type token
    must not combine with the stale beats value into a fabricated
    mid-measure time-signature change."""
    lmx = ("measure time beat-type:4 beats:3 C4 voice:1 quarter "
           "beat-type:8 C4 voice:1 quarter")
    root, errors = delinearize_to_element(lmx)
    assert any("beat-type" in e for e in errors)
    times = root.findall("part/measure/attributes/time")
    assert len(times) == 1, ET.tostring(root)
    assert times[0].findtext("beats") == "3"
    assert times[0].findtext("beat-type") == "4"
