"""English text → IPA phonemes.

Pipeline mirrors the reference (utils/g2p/english.py:159-188): ascii-fold →
lowercase → abbreviation expansion → number normalization → per-word G2P →
ipa2 post-pass (r→ɹ, ʤ→dʒ, ʧ→tʃ, dark-l marking, '...'→'…').

The reference delegates word G2P to the `eng_to_ipa` package (a CMUdict
lookup). That data is unavailable in this image, so we embed a lexicon for
frequent words (lexicon_en.py) and fall back to rule-based letter-to-sound
for OOV words. The output IPA conventions match the trained vocabulary.
"""

from __future__ import annotations

import re
import unicodedata

from .lexicon_en import LEXICON
from .numbers_en import normalize_numbers

# --- abbreviations (reference: utils/g2p/english.py:31-50) -----------------
_abbreviations = [
    (re.compile(r"\b%s\." % abbr, re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"),
        ("st", "saint"), ("co", "company"), ("jr", "junior"),
        ("maj", "major"), ("gen", "general"), ("drs", "doctors"),
        ("rev", "reverend"), ("lt", "lieutenant"), ("hon", "honorable"),
        ("sgt", "sergeant"), ("capt", "captain"), ("esq", "esquire"),
        ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]

VOWELS_IPA = "ɑæɔəɛɪʊaeiou"

# ---------------------------------------------------------------------------
# Rule-based letter-to-sound for OOV words.
#
# Rules are (grapheme, left-context regex, right-context regex, ipa) tried in
# order at each position; the longest/earliest match wins. Contexts are
# regexes anchored at the boundary. Output uses pre-ipa2 conventions
# ('r', 'ʧ', 'ʤ') so the shared post-pass applies uniformly.
# ---------------------------------------------------------------------------

V = "[aeiouy]"  # orthographic vowels
C = "[bcdfghjklmnpqrstvwxz]"

# fmt: off
_LTS_RULES = [
    # reducible prefixes (unstressed in most derived words: behave, depict,
    # resign, exclude, confirm — CMUdict reduces these to ɪ/ə)
    ("be",  "^", C + "[a-z]*" + V, "bɪ"),
    ("de",  "^", C + "[a-z]*" + V, "dɪ"),
    ("re",  "^", C + "[a-z]*" + V, "rɪ"),
    ("pre", "^", C + "[a-z]*" + V, "prɪ"),
    ("ex",  "^", C, "ɪks"),
    ("con", "^", C + "[a-z]*" + V, "kən"),
    ("com", "^", C + "[a-z]*" + V, "kəm"),
    # unstressed suffixes (vowel required earlier in the word so short
    # monosyllables — went, ant, pal, age — keep their full vowel).
    # Inflected variants (-tions, -ments, -ors, …) come FIRST: rule
    # matching is first-match, and the bare "$"-anchored forms cannot
    # fire with a trailing s — without these, every plural of a suffixed
    # word fell through to letter-by-letter ɛs/ɔrs endings (the largest
    # single error class in the round-3 PER analysis)
    ("ations", None, "$", "eɪʃənz"),
    ("tions",  None, "$", "ʃənz"),
    ("sions",  V + "$", "$", "ʒənz"),
    ("sions",  None, "$", "ʃənz"),
    ("ments",  V + "[a-z]*", "$", "mənts"),
    ("ances",  V + "[a-z]*", "$", "ənsəz"),
    ("ences",  V + "[a-z]*", "$", "ənsəz"),
    ("ians",   None, "$", "iənz"),
    ("ors",    V + "[a-z]*", "$", "ərz"),
    ("ers",    V + "[a-z]*", "$", "ərz"),
    ("als",    V + "[a-z]*", "$", "əlz"),
    ("ives",   V + "[a-z]*", "$", "ɪvz"),
    ("ies",    C + "$", "$", "iz"),
    ("ied",    C + "$", "$", "id"),
    ("ology",   None, "$", "ɑləʤi"),
    ("ography", None, "$", "ɑgrəfi"),
    ("ously",   V + "[a-z]*", "$", "əsli"),
    ("ages",    V + "[a-z]*", "$", "əʤəz"),
    ("able",    V + "[a-z]*", "$", "əbəl"),
    ("ible",    V + "[a-z]*", "$", "əbəl"),
    # place/person-name codas (washington, johnson, oxford, poland)
    ("ton",     V + "[a-z]*", "$", "tən"),
    ("son",     V + "[a-z]*", "$", "sən"),
    ("ford",    V + "[a-z]*", "$", "fərd"),
    ("land",    V + "[a-z]*", "$", "lənd"),
    ("el",      V + "[a-z]*", "$", "əl"),
    ("ation", None, None, "eɪʃən"),
    ("tion",  None, None, "ʃən"),
    ("sion",  V + "$", None, "ʒən"),
    ("sion",  None, None, "ʃən"),
    ("cious", None, None, "ʃəs"),
    ("tious", None, None, "ʃəs"),
    ("cial",  None, None, "ʃəl"),
    ("tial",  None, None, "ʃəl"),
    ("ment",  V + "[a-z]*", "$", "mənt"),
    ("ness",  None, "$", "nəs"),
    ("ous",   V + "[a-z]*", "$", "əs"),
    ("ance",  V + "[a-z]*", "$", "əns"),
    ("ence",  V + "[a-z]*", "$", "əns"),
    ("ant",   V + "[a-z]*", "$", "ənt"),
    ("ent",   V + "[a-z]*", "$", "ənt"),
    ("age",   V + "[a-z]*", "$", "əʤ"),
    ("ful",   V + "[a-z]*", "$", "fəl"),
    ("ism",   V + "[a-z]*", "$", "ɪzəm"),
    ("ity",   None, "$", "əti"),
    ("acy",   None, "$", "əsi"),
    ("ive",   V + "[a-z]*", "$", "ɪv"),
    ("ian",   None, "$", "iən"),
    ("al",    V + "[a-z]*", "$", "əl"),
    ("or",    V + "[a-z]*", "$", "ər"),
    ("le",    "[bcdfgkpstvz]", "$", "əl"),
    # multi-letter graphemes
    ("ture",  None, "$", "ʧər"),
    ("tures", None, "$", "ʧərz"),
    ("tur",   None, V, "ʧər"),
    # plural / 3sg endings: voiced after vowels and voiced consonants,
    # syllabic after sibilants (machines → -nz, uses → -zəz, boxes — the
    # raw-rule endings previously spelled the 'e' as ɛ and the s as /s/)
    ("less",  V + "[a-z]*", "$", "ləs"),
    ("oes",   None, "$", "oʊz"),
    ("sis",   None, "$", "səs"),           # analysis, basis, diagnosis
    ("is",    V + "[a-z]*" + C, "$", "əs"),
    ("us",    None, "$", "əs"),            # campus, virus — never voiced
    ("ss",    None, "$", "s"),
    ("ated",  V + "[a-z]*", "$", "eɪtəd"),
    ("ates",  V + "[a-z]*", "$", "eɪts"),
    ("es",    "(s|x|z|ch|sh|c|g)", "$", "əz"),
    ("es",    V + "[a-z]+", "$", "z"),
    ("s",     "[aeiouy][a-z]*[bdglmnrvw]", "$", "z"),
    ("s",     V, "$", "z"),
    # latinate/greek & loanword onsets and codas
    ("ex",    "^$", "[ai]", "ɪgz"),
    ("pn",    "^$", None, "n"),
    ("que",   None, "$", "k"),
    ("eau",   None, None, "oʊ"),
    ("u",     "^$", "(n[iey]|s[aeiouy]|t[aeiouy])", "ju"),
    # closed-compound function words (someone, everywhere, sometimes)
    ("some",  "^$", "[a-z]", "səm"),
    ("one",   "(some|any|every)", "$", "wən"),
    ("where", "(some|any|every|no)", "$", "wɛr"),
    ("times", V + "[a-z]*", "$", "taɪmz"),
    # palatalization before a (associate, negotiate, sociable — NOT
    # society/science, where i is a full nucleus)
    ("ci",    "[aeiou]", "a", "ʃi"),
    ("ti",    "[aeiou]", "a", "ʃi"),
    ("ia",    None, "$", "iə"),
    ("sm",    V, "$", "zəm"),
    ("ought", None, None, "ɔt"),
    ("aught", None, None, "ɔt"),
    ("augh",  None, None, "æf"),
    ("ough",  None, "$", "oʊ"),
    ("igh",   None, None, "aɪ"),
    ("eigh",  None, None, "eɪ"),
    ("tch",   None, None, "ʧ"),
    ("dge",   None, None, "ʤ"),
    ("sch",   None, None, "sk"),
    ("ch",    None, C, "k"),     # greek/loan clusters: technical, chrome
    ("ch",    None, None, "ʧ"),
    ("ck",    None, None, "k"),
    ("sh",    None, None, "ʃ"),
    ("th",    None, None, "θ"),
    ("ph",    None, None, "f"),
    ("gh",    "^$", None, "g"),      # word-initial gh
    ("gh",    None, None, ""),        # silent otherwise
    ("wh",    None, "o", "h"),        # who, whole
    ("wh",    None, None, "w"),
    ("wr",    "^$", None, "r"),
    ("kn",    "^$", None, "n"),
    ("gn",    "^$", None, "n"),
    ("ps",    "^$", None, "s"),
    ("qu",    None, None, "kw"),
    ("ng",    None, "$", "ŋ"),
    ("ng",    None, None, "ŋg"),
    ("nk",    None, None, "ŋk"),
    ("alk",   None, None, "ɔk"),
    ("all",   None, "$", "ɔl"),
    ("ange",  None, "$", "eɪnʤ"),
    ("nge",   None, "$", "nʤ"),
    ("oo",    None, "k", "ʊ"),
    ("oo",    None, None, "u"),
    ("ee",    None, None, "i"),
    ("ead",   None, "$", "ɛd"),
    ("ea",    None, None, "i"),
    ("eur",   None, None, "jʊr"),
    ("eu",    None, None, "ju"),
    ("ui",    None, None, "u"),
    ("ai",    None, None, "eɪ"),
    ("ay",    None, None, "eɪ"),
    ("ey",    None, "$", "i"),
    ("ei",    None, None, "eɪ"),
    ("au",    None, None, "ɔ"),
    ("aw",    None, None, "ɔ"),
    ("oa",    None, None, "oʊ"),
    ("ow",    None, "$", "oʊ"),
    ("ow",    None, None, "aʊ"),
    ("ou",    None, None, "aʊ"),
    ("oi",    None, None, "ɔɪ"),
    ("oy",    None, None, "ɔɪ"),
    ("ie",    None, "$", "aɪ"),
    ("ie",    None, None, "i"),
    ("ue",    None, "$", "u"),
    ("ew",    None, None, "u"),
    ("cc",    None, "[eiy]", "ks"),
    ("cc",    None, None, "k"),
    ("gue",   None, "$", "g"),
    ("gu",    None, "[ei]", "g"),
    ("mb",    None, "$", "m"),
    ("oup",   None, None, "up"),
    ("air",   None, None, "ɛr"),
    ("ier",   None, C, "ɪr"),
    ("fy",    V + "[a-z]*", "$", "faɪ"),
    ("ply",   V + "[a-z]*", "$", "plaɪ"),
    ("ue",    V + "[a-z]*[nl]", "$", "ju"),
    ("pf",    "^", None, "f"),
    ("ted",   None, "$", "tɪd"),
    ("ded",   None, "$", "dɪd"),
    ("ed",    V + "[a-z]*", "$", "d"),
    ("wor",   "^", C, "wər"),
    ("ar",    "w", None, "ɔr"),
    ("ar",    None, None, "ɑr"),
    ("er",    None, None, "ər"),
    ("ir",    None, None, "ər"),
    ("ur",    None, None, "ər"),
    ("or",    None, None, "ɔr"),
    # magic-e: vowel + single consonant + e$
    ("a",     None, C + "e$", "eɪ"),
    ("i",     None, C + "e$", "aɪ"),
    ("o",     None, C + "e$", "oʊ"),
    ("u",     None, C + "e$", "ju"),
    ("e",     None, C + "e$", "i"),
    # single letters
    ("a",     "^$", C + "[aeiouy]", "ə"),  # about, again, around (unstressed)
    ("i",     None, "[aeou]", "i"),        # hiatus: period, curious, union
    ("a",     None, None, "æ"),
    ("e",     "^" + C + "+", "$", "i"),  # CV monosyllable: me, he, she
    ("e",     None, "$", ""),         # final silent e
    ("e",     None, None, "ɛ"),
    ("i",     None, "$", "i"),
    ("i",     None, None, "ɪ"),
    ("o",     None, "$", "oʊ"),
    ("o",     None, None, "ɑ"),
    ("u",     None, None, "ə"),
    ("y",     "^$", None, "j"),
    ("y",     None, "$", "i"),
    ("y",     None, None, "ɪ"),
    ("b", None, None, "b"), ("c", None, "[eiy]", "s"),
    ("c", None, None, "k"), ("d", None, None, "d"),
    ("f", None, None, "f"), ("g", None, "[eiy]", "ʤ"),
    ("g", None, None, "g"), ("h", None, None, "h"),
    ("j", None, None, "ʤ"), ("k", None, None, "k"),
    ("l", None, None, "l"), ("m", None, None, "m"),
    ("n", None, None, "n"), ("p", None, None, "p"),
    ("r", None, None, "r"), ("s", V + "$", V, "z"),
    ("s", None, None, "s"), ("t", None, None, "t"),
    ("v", None, None, "v"), ("w", None, None, "w"),
    ("x", None, None, "ks"), ("z", None, None, "z"),
    ("q", None, None, "k"),
    ("'", None, None, ""),
]
# fmt: on

_compiled_rules = [
    (
        g,
        re.compile((lc or "") + "$") if lc else None,
        re.compile("^" + rc) if rc else None,
        out,
    )
    for g, lc, rc, out in _LTS_RULES
]


_DOUBLE_CONS = re.compile(r"([bdfgklmnprstvz])\1")

_NUCLEUS_VOWELS = "ɑæɔəɛɪʊaeiou"
_DIPHTHONGS = {"eɪ", "aɪ", "ɔɪ", "oʊ", "aʊ"}


def _reduce_unstressed(ipa: str) -> str:
    """Crude vowel reduction: in 2+-syllable words, non-initial lax æ/ɑ
    reduce to ə (English unstressed syllables centralize; CMUdict shows
    this in ~2/3 of such nuclei — measured on the embedded lexicon, this
    pass cuts LTS phoneme error rate 19.4% → 18.1%). Diphthongs and
    r-colored vowels keep their quality; the first nucleus is assumed
    stressed (the default stress heuristic puts ˈ there too)."""
    spans, i = [], 0
    while i < len(ipa):
        if ipa[i] in _NUCLEUS_VOWELS:
            j = i + 1
            if j < len(ipa) and ipa[i : j + 1] in _DIPHTHONGS:
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    if len(spans) < 2:
        return ipa
    out = list(ipa)
    for k, (a, b) in enumerate(spans):
        if k == 0:
            continue
        seg = ipa[a:b]
        if seg in _DIPHTHONGS or ipa[b : b + 1] == "r":
            continue
        if seg in "æɑ":
            out[a:b] = "ə"
    return "".join(out)


def letter_to_sound(word: str) -> str:
    """Rule-based G2P for an OOV word → pre-ipa2 IPA (no stress marks)."""
    word = word.lower()
    # doubled consonants spell one sound (pass, hull, apparent); 'cc' is
    # kept — it splits to /ks/ before e/i (accident, accept). A FINAL
    # "ss" survives reduction so the -ness/-less suffix rules can see it
    # and so the plural voicing rule never turns class/pass into -z
    tail = ""
    if word.endswith("ss"):
        word, tail = word[:-2], "ss"
    word = _DOUBLE_CONS.sub(r"\1", word) + tail
    out = []
    i = 0
    n = len(word)
    while i < n:
        matched = False
        for g, lc, rc, ipa in _compiled_rules:
            if not word.startswith(g, i):
                continue
            if lc is not None and not lc.search(word[:i]):
                continue
            if rc is not None and not rc.search(word[i + len(g):]):
                continue
            out.append(ipa)
            i += len(g)
            matched = True
            break
        if not matched:
            i += 1  # drop unknown characters
    return _reduce_unstressed("".join(out))


def _add_default_stress(ipa: str) -> str:
    """Place ˈ before the first vowel's onset (crude CMU-style default)."""
    if "ˈ" in ipa or "ˌ" in ipa:
        return ipa
    for idx, ch in enumerate(ipa):
        if ch in VOWELS_IPA:
            onset = idx
            while onset > 0 and ipa[onset - 1] not in VOWELS_IPA:
                onset -= 1
            return ipa[:onset] + "ˈ" + ipa[onset:]
    return ipa


def _plural(base: str) -> str:
    return base + (
        "əz" if base[-1] in "szʃʒʧʤ" else ("s" if base[-1] in "ptkfθ" else "z")
    )


def _past(base: str) -> str:
    return base + (
        "əd" if base[-1] in "td" else ("t" if base[-1] in "pkfθsʃʧ" else "d")
    )


def _stem_candidates(stem: str):
    """Orthographic stems a suffix may have been attached to:
    identity, e-restoration (mak→make), un-doubling (runn→run),
    i→y restoration (studi→study, happi→happy)."""
    yield stem
    yield stem + "e"
    if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
        yield stem[:-1]
    if stem.endswith("i"):
        yield stem[:-1] + "y"


# suffix → function(base_ipa) -> ipa  (ordered longest-first)
_SUFFIX_RULES = [
    ("'s", _plural),
    ("ments", lambda b: _plural(b + "mənt")),
    ("ness", lambda b: b + "nəs"),
    ("ment", lambda b: b + "mənt"),
    ("less", lambda b: b + "ləs"),
    ("ful", lambda b: b + "fəl"),
    ("able", lambda b: b + "əbəl"),
    ("ably", lambda b: b + "əbli"),
    ("ings", lambda b: _plural(b + "ɪŋ")),
    ("ing", lambda b: b + "ɪŋ"),
    ("ers", lambda b: _plural(b + "ər")),
    ("est", lambda b: b + "əst"),
    ("er", lambda b: b + "ər"),
    ("ed", _past),
    ("ly", lambda b: (b[:-1] if b.endswith("l") else b) + "li"),
    ("es", _plural),
    ("s", _plural),
    ("ish", lambda b: b + "ɪʃ"),
    ("en", lambda b: b + "ən"),
    ("y", lambda b: b + "i"),
]

# prefix → ipa prefix (attached to an independently-resolvable remainder)
_PREFIX_RULES = [
    ("counter", "ˌkaʊntər"), ("under", "ˌəndər"), ("inter", "ˌɪntər"),
    ("over", "ˌoʊvər"), ("super", "ˌsupər"), ("multi", "ˌməlti"),
    ("anti", "ˌænti"), ("semi", "ˌsɛmi"), ("trans", "trænz"),
    ("micro", "ˌmaɪkroʊ"), ("ultra", "ˌəltrə"), ("non", "nɑn"),
    ("out", "ˌaʊt"), ("mis", "mɪs"), ("pre", "pri"), ("sub", "səb"),
    ("dis", "dɪs"), ("un", "ən"), ("re", "ri"), ("co", "koʊ"),
    ("de", "di"),
]


def _lookup(word: str, depth: int = 0):
    """Lexicon lookup with morphological decomposition. Returns IPA or
    None (→ caller falls back to letter-to-sound)."""
    if word in LEXICON:
        return LEXICON[word]
    if depth >= 3 or len(word) < 3:
        return None

    for suffix, attach in _SUFFIX_RULES:
        if not word.endswith(suffix) or len(word) - len(suffix) < 2:
            continue
        for stem in _stem_candidates(word[: -len(suffix)]):
            base = LEXICON.get(stem)
            if base is None and depth == 0:
                base = _lookup(stem, depth + 1)
            if base is not None:
                return attach(base)

    for prefix, ipa in _PREFIX_RULES:
        if word.startswith(prefix) and len(word) - len(prefix) >= 3:
            rest = _lookup(word[len(prefix):], depth + 1)
            if rest is not None:
                return ipa + rest.replace("ˈ", "" if "ˈ" in ipa else "ˈ")

    # closed compounds: both halves independently resolvable
    if depth == 0 and len(word) >= 6:
        for cut in range(len(word) - 2, 2, -1):
            left, right = word[:cut], word[cut:]
            if left in LEXICON and len(right) >= 3:
                r = _lookup(right, depth + 1)
                if r is not None:
                    return LEXICON[left] + r.replace("ˈ", "ˌ")
    return None


def _hybrid_compound(word: str):
    """Half-lexicon compounds for the true OOV tail (brexiteers,
    cyberattack): one half resolves through the lexicon, the other
    through letter-to-sound. Tried only after full _lookup fails — a
    correct lexicon half beats running the rules over the whole word.
    Requires halves >= 4 letters so short accidental splits (e.g.
    'ing'-like tails) don't fire."""
    if len(word) < 8:
        return None
    for cut in range(len(word) - 4, 3, -1):
        left, right = word[:cut], word[cut:]
        lf, rt = _lookup(left, 1), _lookup(right, 1)
        if lf is not None and rt is None:
            return lf + letter_to_sound(right)
        if lf is None and rt is not None:
            return letter_to_sound(left) + rt.replace("ˈ", "ˌ")
    return None


def is_oov(word: str) -> bool:
    """True when the word falls through to rule-based letter-to-sound."""
    return _lookup(word.lower()) is None


def word_to_ipa(word: str) -> str:
    w = word.lower()
    found = _lookup(w)
    if found is not None:
        return found
    hybrid = _hybrid_compound(w)
    if hybrid is not None:
        return _add_default_stress(hybrid)
    ipa = letter_to_sound(w)
    return _add_default_stress(ipa)


def expand_abbreviations(text: str) -> str:
    for regex, replacement in _abbreviations:
        text = re.sub(regex, replacement, text)
    return text


def ascii_fold(text: str) -> str:
    """Strip diacritics / transliterate to ASCII (lightweight unidecode)."""
    normalized = unicodedata.normalize("NFKD", text)
    return "".join(
        c for c in normalized if not unicodedata.combining(c) and ord(c) < 128
    )


def collapse_whitespace(text: str) -> str:
    return re.sub(r"\s+", " ", text)


_word_re = re.compile(r"[a-z']+|[^a-z'\s]+|\s+")


def english_to_ipa(text: str) -> str:
    text = ascii_fold(text).lower()
    text = expand_abbreviations(text)
    text = normalize_numbers(text)
    pieces = []
    for m in _word_re.finditer(text):
        tok = m.group(0)
        if re.fullmatch(r"[a-z']+", tok):
            pieces.append(word_to_ipa(tok))
        else:
            pieces.append(tok)
    return collapse_whitespace("".join(pieces))


def mark_dark_l(text: str) -> str:
    # reference: utils/g2p/english.py:155-156
    return re.sub(
        r"l([^aeiouæɑɔəɛɪʊ ]*(?: |$))", lambda x: "ɫ" + x.group(1), text
    )


_ipa_to_ipa2 = [("r", "ɹ"), ("ʤ", "dʒ"), ("ʧ", "tʃ")]


def english_to_ipa2(text: str) -> str:
    text = english_to_ipa(text)
    text = mark_dark_l(text)
    for pat, repl in _ipa_to_ipa2:
        text = text.replace(pat, repl)
    return text.replace("...", "…")
