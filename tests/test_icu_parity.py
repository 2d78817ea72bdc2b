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
2. A/B sweep (runs only where PyICU is installed -- skipped in this
   image): every BMP letter sequence sample plus multilingual corpus
   lines through both implementations, asserting identical output.
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
    ("ǝ", "e"),                        # turned e
    ("Ǥuovdageaidnu", "guovdageaidnu"),  # Sámi g-bar
    ("đavvi", "davvi"),                # Sámi d-bar
    ("ŋalbmi", "ngalbmi"),             # Sámi eng
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
    icu = pytest.importorskip("icu")
    trans = icu.Transliterator.createInstance(
        "NFKD; [:Nonspacing Mark:] Remove; Latin-ASCII; NFKC")
    norm = icu.Normalizer2.getNFKCCasefoldInstance()

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
