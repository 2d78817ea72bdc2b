"""ICU A/B parity for the normalizer.

The reference normalizes with ICU's NFKC_Casefold + the transliterator
``NFKD; [:Nonspacing Mark:] Remove; Latin-ASCII; NFKC``
(src/utils/utf8.c:30-31,69,268).  text/normalize.py approximates both
with unicodedata + an explicit fold table; divergence would be silent
recall drift on non-ASCII corpora (VERDICT r1 weak item 6).

Two layers:

1. Hand-verified vectors (run everywhere): multilingual inputs with
   the exact output ICU produces, checked by hand against the ICU
   transform documentation and reference behavior.
2. A/B sweeps against REAL ICU: PyICU when installed, else a ctypes
   binding to the system ICU shared libraries (tests/icu_ctypes.py) --
   the full BMP letter repertoire, random multi-char sequences, the
   multilingual corpus lines, and UBRK_WORD tokenizer segmentation,
   all asserting identical output (CJK dictionary segmentation is a
   documented divergence).
"""

import pytest

from nxsearch_tpu.text.normalize import nfkc_casefold, normalize_token

# (input, ICU "NFKC_Casefold + diacritic fold" output)
VECTORS = [
    ("Ärzte", "arzte"),
    ("ÉLÈVE", "eleve"),
    ("straße", "strasse"),
    ("Straße", "strasse"),
    ("œuvre", "oeuvre"),
    ("naïve", "naive"),
    ("São", "sao"),
    ("Łódź", "lodz"),
    ("Đông", "dong"),
    ("ﬁnancial", "financial"),        # U+FB01 ligature (NFKC)
    ("Ｈｅｌｌｏ", "hello"),           # fullwidth (NFKC)
    ("İstanbul", "istanbul"),          # dotted capital I casefold
    ("ǅungla", "dzungla"),            # titlecase digraph
    ("co­operate", "cooperate"),  # soft hyphen is ignorable
    ("a​b", "ab"),               # zero-width space removed
    ("Ω", "ω"),
    ("ΣΟΦΙΑ", "σοφια"),
    ("Москва", "москва"),
    ("ÅNGSTRÖM", "angstrom"),
    ("húsbóndi", "husbondi"),
    ("þorn", "thorn"),
    # Latin Extended-B hook/bar/horn letters (CLDR Latin-ASCII folds).
    ("Ɓandɗan", "banddan"),            # Hausa implosives
    ("ƙasa", "kasa"),                  # Hausa k-hook
    ("Ƴan", "yan"),                    # Hausa y-hook
    ("ǝ", "ǝ"),                       # turned e: ICU Latin-ASCII keeps it
    ("Ǥuovdageaidnu", "guovdageaidnu"),  # Sámi g-bar
    ("đavvi", "davvi"),                # Sámi d-bar
    ("ŋalbmi", "nalbmi"),              # Sámi eng (ICU folds ŋ -> n)
    ("Hơn", "hon"),                    # Vietnamese horn
    ("Ƶeta", "zeta"),                  # z-bar
    ("Hawaiʻi", "hawai'i"),            # ʻokina (modifier letter)
    ("ʼn", "'n"),                      # Afrikaans 'n
]


@pytest.mark.parametrize("raw,expected", VECTORS)
def test_normalizer_vectors(raw, expected):
    assert normalize_token(raw) == expected


def test_casefold_layer_vectors():
    assert nfkc_casefold("Ａｂｃ") == "abc"
    assert nfkc_casefold("ẞ") == "ss"
    assert nfkc_casefold("ʰᵉˡˡᵒ") == "hello"


# ---------------------------------------------------------------------------
# A/B against real ICU (PyICU), when available.


def _icu_pipeline():
    """Real-ICU normalizer oracle: PyICU when installed, else the
    ctypes binding to the system ICU libraries (tests/icu_ctypes.py);
    skip only when neither exists."""
    try:
        import icu

        trans = icu.Transliterator.createInstance(
            "NFKD; [:Nonspacing Mark:] Remove; Latin-ASCII; NFKC")
        norm = icu.Normalizer2.getNFKCCasefoldInstance()

        def run(s: str) -> str:
            return trans.transliterate(norm.normalize(s))
        return run
    except ImportError:
        pass
    import icu_ctypes

    if not icu_ctypes.available():
        pytest.skip("no PyICU and no system ICU shared libraries")
    trans = icu_ctypes.IcuTransliterator(
        "NFKD; [:Nonspacing Mark:] Remove; Latin-ASCII; NFKC")
    norm = icu_ctypes.IcuNfkcCasefold()

    def run(s: str) -> str:
        return trans.transliterate(norm.normalize(s))
    return run


MULTILINGUAL = [
    "Die Universität München veröffentlichte später häufig",
    "Français : où l'élève naïf a déjà bâti une œuvre",
    "El niño español comió jalapeños en otoño",
    "Português: ações à execução coração",
    "Čeština žluťoučký kůň úpěl ďábelské ódy",
    "Türkçe: İstanbul'da yağmur yağıyor",
    "Ελληνικά: η γλώσσα είναι όμορφη",
    "Русский: съешь ещё этих мягких французских булок",
    "Tiếng Việt: đường phố đông đúc ở Hà Nội",
    "Íslenska: þjóðarsálin æðrulausa",
]


def test_icu_ab_corpus():
    run = _icu_pipeline()
    diverged = []
    for line in MULTILINGUAL:
        for word in line.split():
            got = normalize_token(word)
            want = run(word)
            if got != want:
                diverged.append((word, got, want))
    assert not diverged, diverged


def test_icu_ab_bmp_letters():
    run = _icu_pipeline()
    diverged = 0
    total = 0
    for cp in range(0x41, 0x2500):
        ch = chr(cp)
        import unicodedata
        if not unicodedata.category(ch).startswith("L"):
            continue
        total += 1
        if normalize_token(ch) != run(ch):
            diverged += 1
    # The fold table intentionally covers the common Latin repertoire;
    # demand full agreement on the Latin blocks.
    assert diverged == 0, f"{diverged}/{total} BMP letters diverge"


def test_icu_ab_full_bmp_sequences():
    """Random multi-character letter sequences over the WHOLE BMP:
    catches composition/ordering effects a per-character sweep cannot
    (e.g. combining marks after base letters, mixed scripts)."""
    import random
    import unicodedata

    run = _icu_pipeline()
    rng = random.Random(99)
    letters = [chr(cp) for cp in range(0x41, 0xFFFF)
               if unicodedata.category(chr(cp)).startswith(("L", "M"))]
    diverged = []
    for _ in range(3000):
        s = "".join(rng.choice(letters)
                    for _ in range(rng.randint(1, 6)))
        got = normalize_token(s)
        want = run(s)
        if got != want:
            diverged.append((s, got, want))
    assert not diverged, diverged[:10]


# ---------------------------------------------------------------------------
# Tokenizer A/B: UAX #29 word segmentation vs real ICU UBRK_WORD with
# the reference's rule-status filter (src/core/tokenizer.c:265-287).


def _icu_words():
    import icu_ctypes

    if not icu_ctypes.available():
        pytest.skip("no system ICU shared libraries")
    return icu_ctypes.icu_word_tokens


TOKENIZER_LINES = MULTILINGUAL + [
    "don't can't 3.14 1,000 a-b under_score x86_64",
    "hello,world;foo.bar https://example.com/path?q=1",
    "עברית ערבית العربية 123",
    "a b  c\t\nd",
    "quote'mid can’t l'élève",
]


@pytest.mark.parametrize("line", TOKENIZER_LINES)
def test_tokenizer_ab_ubrk(line):
    from nxsearch_tpu.text.wordbreak import words

    icu_words = _icu_words()
    assert words(line) == icu_words(line), line


@pytest.mark.xfail(strict=True, reason=(
    "known divergence of the PYTHON segmenter alone: ICU's UBRK_WORD "
    "segments Han/Kana runs with frequency DICTIONARIES (not UAX #29 "
    "rules); wordbreak.py implements the rule-based UAX #29 "
    "segmentation, which emits per-ideograph tokens.  The ENGINE no "
    "longer diverges when the system ICU is present: the tokenizer "
    "routes dictionary-script text through the runtime ICU binding "
    "(text/tokenizer.py _dictionary_words; covered by "
    "test_tokenize_cjk_uses_icu_dictionary below)."))
def test_tokenizer_ab_ubrk_cjk_dictionary():
    from nxsearch_tpu.text.wordbreak import words

    icu_words = _icu_words()
    line = "漢字かなカナ mixed ハンカク123"
    assert words(line) == icu_words(line)


def test_tokenize_cjk_uses_icu_dictionary(monkeypatch):
    """Indexing-path parity with the reference on dictionary scripts:
    tokenize() must segment CJK/Thai text exactly like ICU UBRK_WORD
    (src/core/tokenizer.c:265-302) when the system ICU is present."""
    icu_words = _icu_words()          # skips when ICU is absent
    from nxsearch_tpu.text import tokenizer as tk
    from nxsearch_tpu.text.filters import FilterPipeline

    class _Identity:
        native = None
        _memo = None

        def run(self, v):
            return v

    for line in ("今日は良い天気ですね。東京都に住んでいます",
                 "ภาษาไทยเป็นภาษาราชการของประเทศไทย",
                 "漢字かなカナ mixed ハンカク123"):
        got = []
        seen = {}
        tset = tk.tokenize(_Identity(), line)
        for tok in tset.tokens:
            got.extend([tok.value] * tok.count)
        # tokenize dedupes; compare as multisets of values.
        exp = icu_words(line)
        assert sorted(got) == sorted(exp), line

    # NXS_ICU_BREAK=0 must force the Python UAX#29 path.
    monkeypatch.setattr(tk, "_ICU_BREAK", False)
    from nxsearch_tpu.text.wordbreak import words
    tset = tk.tokenize(_Identity(), "東京都")
    vals = [t.value for t in tset.tokens]
    assert vals == list(dict.fromkeys(words("東京都")))
