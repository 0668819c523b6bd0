"""Reference parity for the deterministic G2P conversion stages.

The reference's zh/ja pipelines have two halves: a dictionary half that
needs pip packages absent from this image (pypinyin/jieba/pyopenjtalk) and
a pure-regex conversion half (bopomofo→IPA, accented-romaji→IPA2) whose
tables live entirely in the reference source
(/root/reference/utils/g2p/mandarin.py:111-230, japanese.py:20-67).

These tests import the reference modules with the missing packages stubbed
out (the stubs are only touched by the dictionary half, which we never
call) and assert our conversion stages match the reference's regex tables
exactly — over the full pinyin syllable inventory × 5 tones for Mandarin,
and over the accent-golden corpus plus synthetic Q/N assimilation cases
for Japanese.
"""

import importlib.util
import re
import sys
import types

import pytest

from tests.conftest import REFERENCE_DIR, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)


def _load_reference_module(name, stubs):
    """Import a reference g2p module with absent pip deps stubbed."""
    inserted = []
    for mod in stubs:
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            # `from unidecode import unidecode` needs the attribute
            setattr(stub, mod, lambda x: x)
            sys.modules[mod] = stub
            inserted.append(mod)
    try:
        path = f"{REFERENCE_DIR}/utils/g2p/{name}.py"
        spec = importlib.util.spec_from_file_location(f"ref_g2p_{name}", path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    finally:
        for mod in inserted:
            del sys.modules[mod]


@pytest.fixture(scope="module")
def ref_mandarin():
    return _load_reference_module("mandarin", ["jieba", "cn2an"])


@pytest.fixture(scope="module")
def ref_japanese():
    return _load_reference_module("japanese", ["unidecode"])


# ---------------------------------------------------------------------------
# Mandarin: bopomofo → IPA
# ---------------------------------------------------------------------------

def _all_bopomofo_syllables():
    """Every distinct (syllable, tone) bopomofo rendering reachable from the
    embedded pinyin table — the exact input space of the conversion stage."""
    from vallex_tpu.frontend.mandarin import pinyin_to_bopomofo
    from vallex_tpu.frontend.pinyin_data import PINYIN_TABLE, WORD_OVERRIDES

    sylls = set()
    for py in PINYIN_TABLE.values():
        sylls.add(py)
    for pys in WORD_OVERRIDES.values():
        sylls.update(pys)
    bases = sorted({re.sub(r"\d$", "", s) for s in sylls})
    out = []
    for base in bases:
        for tone in "12345":
            out.append(pinyin_to_bopomofo(base + tone))
    return out


def _ref_post_bopomofo_to_ipa(ref, text):
    """The tail of the reference's chinese_to_ipa from the bopomofo stage on
    (reference mandarin.py:301-312), composed from the reference's own
    table functions."""
    text = ref.bopomofo_to_ipa(text)
    text = re.sub("i([aoe])", r"j\1", text)
    text = re.sub("u([aoəe])", r"w\1", text)
    text = re.sub(
        "([sɹ]`[⁼ʰ]?)([→↓↑ ]+|$)", r"\1ɹ`\2", text
    ).replace("ɻ", "ɹ`")
    text = re.sub("([s][⁼ʰ]?)([→↓↑ ]+|$)", r"\1ɹ\2", text)
    return text


def test_bopomofo_to_ipa_table_parity(ref_mandarin):
    """Raw table stage: ours vs the reference's _bopomofo_to_ipa regexes."""
    from vallex_tpu.frontend.mandarin import bopomofo_to_ipa

    mismatches = []
    for bopo in _all_bopomofo_syllables():
        ours = bopomofo_to_ipa(bopo)
        ref = ref_mandarin.bopomofo_to_ipa(bopo)
        if ours != ref:
            mismatches.append((bopo, ours, ref))
    assert not mismatches, mismatches[:20]


def test_post_bopomofo_stage_parity(ref_mandarin):
    """Full post-pinyin stage (table + glide/fricative fixups), per syllable
    and on multi-syllable strings with spaces and punctuation."""
    from vallex_tpu.frontend.mandarin import post_bopomofo_to_ipa

    sylls = _all_bopomofo_syllables()
    mismatches = []
    for bopo in sylls:
        ours = post_bopomofo_to_ipa(bopo)
        ref = _ref_post_bopomofo_to_ipa(ref_mandarin, bopo)
        if ours != ref:
            mismatches.append((bopo, ours, ref))
    assert not mismatches, mismatches[:20]
    # join chunks of 5 syllables into phrases (tone marks + spaces interact
    # with the fricative fixups' lookahead class)
    for i in range(0, min(len(sylls), 400), 5):
        phrase = " ".join(sylls[i : i + 5]) + "。"
        assert post_bopomofo_to_ipa(phrase) == _ref_post_bopomofo_to_ipa(
            ref_mandarin, phrase
        )


def test_latin_to_bopomofo_parity(ref_mandarin):
    from vallex_tpu.frontend.mandarin import latin_to_bopomofo

    for s in ["abcdefghijklm", "nopqrstuvwxyz", "OK", "CEO", "GDP2024"]:
        assert latin_to_bopomofo(s) == ref_mandarin.latin_to_bopomofo(s)


# ---------------------------------------------------------------------------
# Japanese: accented romaji → IPA2
# ---------------------------------------------------------------------------

def _ref_post_romaji_to_ipa2(ref, text):
    """The tail of the reference's japanese_to_ipa2 after romaji generation
    (reference japanese.py:139-145)."""
    text = ref.get_real_sokuon(text)
    text = ref.get_real_hatsuon(text)
    for regex, replacement in ref._romaji_to_ipa2:
        text = re.sub(regex, replacement, text)
    return text


def test_post_romaji_stage_parity_on_goldens(ref_japanese):
    """Run every accent-golden romaji rendering through both stage tails."""
    from tests.test_japanese_accent import GOLDENS
    from vallex_tpu.frontend.japanese import post_romaji_to_ipa2

    for _, romaji in GOLDENS:
        assert post_romaji_to_ipa2(romaji) == _ref_post_romaji_to_ipa2(
            ref_japanese, romaji
        )


def test_post_romaji_stage_parity_synthetic(ref_japanese):
    """Q/N assimilation with accent marks interleaved, devoiced vowels, and
    every consonant the tables mention."""
    from vallex_tpu.frontend.japanese import post_romaji_to_ipa2

    cases = [
        "iQta", "iQ↓ta", "gaQkou", "zaQ↑ʃi", "iQpai", "haQ↓pa",
        "keQjo", "maQʧa", "saQsoku", "Qd", "Qb", "Qg",
        "hoN", "hoNda", "saNpo", "saN↑po", "koNʧa", "keNʥi",
        "aNjo", "kaNto", "maNgetsu", "soN↓na", "N",
        "desU.", "ʃIta", "sUki", "hIto", "kUtsu",
        "ryokou", "nihoN", "ʃiNjuku", "fuji", "yuki", "hikouki",
        "ohayou", "juu", "chi",  # raw 'ch' never reaches this stage but
        # must still be deterministic
    ]
    for romaji in cases:
        assert post_romaji_to_ipa2(romaji) == _ref_post_romaji_to_ipa2(
            ref_japanese, romaji
        )
