"""Snowball stemming algorithms for non-English languages.

The reference stems via libstemmer: ``sb_stemmer_new(lang)`` for
whatever language the index params name (filters_builtin.c:206-245).
This module re-implements the published Snowball algorithms
(snowballstem.org) in Python for the major languages; English keeps
the existing Porter2 implementation (text/porter2.py, with its C++
fast path).  Unknown languages pass tokens through unchanged,
mirroring ``sb_stemmer_new`` returning NULL.

Each stemmer is a pure ``str -> str`` function over lowercase input
(the pipeline's normalizer lowercases first).  The standard Snowball
region machinery:

- R1: the region after the first non-vowel following a vowel.
- R2: the same definition applied within R1.
- RV (language-specific): a smaller region used by Romance/Russian
  algorithms.

Scandinavian languages and German additionally clamp R1 so at least
three letters precede it.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional

from . import porter2

# ---------------------------------------------------------------------------
# Region helpers


def _r1(word: str, vowels: str) -> int:
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def _r1r2(word: str, vowels: str) -> tuple[int, int]:
    r1 = _r1(word, vowels)
    r2 = r1 + _r1(word[r1:], vowels) if r1 < len(word) else len(word)
    return r1, min(r2, len(word))


def _longest(word: str, suffixes) -> str:
    """Longest suffix of ``word`` among ``suffixes`` ('' if none).
    Snowball ``[substring] among(...)`` semantics: the longest raw
    match wins; its branch condition may still fail (no backtrack)."""
    best = ""
    for s in suffixes:
        if len(s) > len(best) and word.endswith(s):
            best = s
    return best


def _in_r(word: str, suffix: str, r: int) -> bool:
    return len(word) - len(suffix) >= r


def _longest_in(word: str, suffixes, r: int) -> str:
    """Longest suffix that lies entirely within the region starting at
    ``r`` -- Snowball ``setlimit tomark p for ([substring]) among``
    semantics: suffixes crossing the region boundary are not match
    candidates at all, so a shorter in-region suffix can win."""
    best = ""
    for s in suffixes:
        if len(s) > len(best) and word.endswith(s) \
                and len(word) - len(s) >= r:
            best = s
    return best


# ---------------------------------------------------------------------------
# Danish (snowballstem.org/algorithms/danish/stemmer.html)

_DA_V = "aeiouyæåø"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)


def stem_da(word: str) -> str:
    if len(word) <= 3:
        return word
    r1 = max(_r1(word, _DA_V), 3)

    # Step 1 (one among, matched within R1: setlimit semantics).
    suf = _longest_in(word, _DA_STEP1 + ("s",), r1)
    if suf == "s":
        if len(word) >= 2 and word[-2] in _DA_S_END:
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]

    def consonant_pair(w: str) -> str:
        if _longest_in(w, ("gd", "dt", "gt", "kt"), r1):
            return w[:-1]
        return w

    word = consonant_pair(word)

    # Step 3.
    if word.endswith("igst"):
        word = word[:-2]
    suf = _longest_in(word, ("ig", "lig", "elig", "els", "løst"), r1)
    if suf == "løst":
        word = word[:-1]
    elif suf:
        word = consonant_pair(word[: -len(suf)])

    # Step 4, undouble: final double consonant in R1 -> single.
    if (len(word) >= 2 and word[-1] == word[-2]
            and word[-1] not in _DA_V and _in_r(word, word[-1], r1)):
        word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# Swedish

_SV_V = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast",
)


def stem_sv(word: str) -> str:
    if len(word) <= 3:
        return word
    r1 = max(_r1(word, _SV_V), 3)

    suf = _longest_in(word, _SV_STEP1 + ("s",), r1)
    if suf == "s":
        if len(word) >= 2 and word[-2] in _SV_S_END:
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]

    if _longest_in(word, ("dd", "gd", "nn", "dt", "gt", "kt", "tt"), r1):
        word = word[:-1]

    suf = _longest_in(word, ("lig", "ig", "els", "löst", "fullt"), r1)
    if suf in ("löst", "fullt"):
        word = word[:-1]
    elif suf:
        word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------------------
# Norwegian

_NO_V = "aeiouyæåø"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
)


def stem_no(word: str) -> str:
    if len(word) <= 3:
        return word
    r1 = max(_r1(word, _NO_V), 3)

    suf = _longest_in(word, _NO_STEP1 + ("ert", "erte", "s"), r1)
    if suf in ("ert", "erte"):
        word = word[: len(word) - len(suf)] + "er"
    elif suf == "s":
        if len(word) >= 2 and (word[-2] in _NO_S_END
                               or (word[-2] == "k"
                                   and (len(word) < 3
                                        or word[-3] not in _NO_V))):
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]

    if _longest_in(word, ("dt", "vt"), r1):
        word = word[:-1]

    suf = _longest_in(word, ("leg", "eleg", "ig", "eig", "lig", "elig",
                             "els", "lov", "elov", "slov", "hetslov"),
                      r1)
    if suf:
        word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------------------
# German

_DE_V = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def stem_de(word: str) -> str:
    word = word.replace("ß", "ss")
    if len(word) <= 2:
        return word
    # Protect u/y between vowels from being treated as vowels.
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and word[i - 1] in _DE_V \
                and word[i + 1] in _DE_V:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1r2(w, _DE_V)
    r1 = max(r1, 3)

    # Step 1.
    suf = _longest(w, ("em", "ern", "er"))
    if suf and _in_r(w, suf, r1):
        w = w[: -len(suf)]
    else:
        suf = _longest(w, ("e", "en", "es"))
        if suf and _in_r(w, suf, r1):
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
        elif w.endswith("s") and _in_r(w, "s", r1) and len(w) >= 2 \
                and w[-2] in _DE_S_END:
            w = w[:-1]

    # Step 2.
    suf = _longest(w, ("en", "er", "est"))
    if suf and _in_r(w, suf, r1):
        w = w[: -len(suf)]
    elif w.endswith("st") and _in_r(w, "st", r1) and len(w) >= 6 \
            and w[-3] in _DE_ST_END:
        w = w[:-2]

    # Step 3: d-suffixes.
    suf = _longest(w, ("end", "ung", "ig", "ik", "isch", "lich",
                       "heit", "keit"))
    if suf in ("end", "ung"):
        if _in_r(w, suf, r2):
            w = w[: -len(suf)]
            if w.endswith("ig") and _in_r(w, "ig", r2) \
                    and not w.endswith("eig"):
                w = w[:-2]
    elif suf in ("ig", "ik", "isch"):
        if _in_r(w, suf, r2) and not w[: -len(suf)].endswith("e"):
            w = w[: -len(suf)]
    elif suf in ("lich", "heit"):
        if _in_r(w, suf, r2):
            w = w[: -len(suf)]
            for pre in ("er", "en"):
                if w.endswith(pre) and _in_r(w, pre, r1):
                    w = w[:-2]
                    break
    elif suf == "keit":
        if _in_r(w, suf, r2):
            w = w[: -len(suf)]
            if w.endswith("lich") and _in_r(w, "lich", r2):
                w = w[:-4]
            elif w.endswith("ig") and _in_r(w, "ig", r2):
                w = w[:-2]

    w = w.replace("U", "u").replace("Y", "y")
    return (w.replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Russian

_RU_V = "аеиоуыэюя"

_RU_PERF_GERUND_1 = ("в", "вши", "вшись")
_RU_PERF_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = (
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
    "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
)
_RU_VERB_2 = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_RU_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
    "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
    "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я",
)


def _ru_among(w: str, rv: int, plain, aya) -> Optional[str]:
    """One Snowball among within RV: longest raw in-region match
    across both groups; ``aya`` suffixes additionally require а/я
    immediately before (inside RV, kept).  A failed condition fails
    the whole among -- no backtracking to shorter suffixes."""
    best, kind = "", None
    for s in plain:
        if len(s) > len(best) and w.endswith(s) and _in_r(w, s, rv):
            best, kind = s, "plain"
    for s in aya:
        if len(s) > len(best) and w.endswith(s) and _in_r(w, s, rv):
            best, kind = s, "aya"
    if not best:
        return None
    if kind == "aya":
        i = len(w) - len(best) - 1
        if i < rv or w[i] not in "ая":
            return None
    return w[: -len(best)]


def stem_ru(word: str) -> str:
    word = word.replace("ё", "е")
    rv = len(word)
    for i, ch in enumerate(word):
        if ch in _RU_V:
            rv = i + 1
            break
    _, r2 = _r1r2(word, _RU_V)
    if rv >= len(word):
        return word
    w = word

    # Step 1.
    res = _ru_among(w, rv, _RU_PERF_GERUND_2, _RU_PERF_GERUND_1)
    if res is not None:
        w = res
    else:
        for s in ("ся", "сь"):
            if w.endswith(s) and _in_r(w, s, rv):
                w = w[:-2]
                break
        res = _ru_among(w, rv, _RU_ADJECTIVE, ())
        if res is not None:
            w = res
            res = _ru_among(w, rv, _RU_PARTICIPLE_2, _RU_PARTICIPLE_1)
            if res is not None:
                w = res
        else:
            res = _ru_among(w, rv, _RU_VERB_2, _RU_VERB_1)
            if res is not None:
                w = res
            else:
                res = _ru_among(w, rv, _RU_NOUN, ())
                if res is not None:
                    w = res

    # Step 2: trailing и.
    if w.endswith("и") and _in_r(w, "и", rv):
        w = w[:-1]

    # Step 3: derivational, in R2.
    for s in ("ость", "ост"):
        if w.endswith(s) and _in_r(w, s, r2):
            w = w[: -len(s)]
            break

    # Step 4 (within RV): undouble нн; or remove superlative ейш(е)
    # then undouble нн; or drop trailing ь.
    if w.endswith("нн") and _in_r(w, "нн", rv):
        w = w[:-1]
    elif w.endswith("ейше") and _in_r(w, "ейше", rv) \
            or w.endswith("ейш") and _in_r(w, "ейш", rv):
        w = w[:-4] if w.endswith("ейше") else w[:-3]
        if w.endswith("нн") and _in_r(w, "нн", rv):
            w = w[:-1]
    elif w.endswith("ь") and _in_r(w, "ь", rv):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Dispatch

_STEMMERS: dict[str, Callable[[str], str]] = {
    "en": porter2.stem,
    "da": stem_da,
    "sv": stem_sv,
    "no": stem_no,
    "nb": stem_no,
    "nn": stem_no,
    "de": stem_de,
    "ru": stem_ru,
}

_ALIASES = {
    "danish": "da", "swedish": "sv", "norwegian": "no", "german": "de",
    "russian": "ru", "english": "en",
}


def get_stemmer(lang: str) -> Optional[Callable[[str], str]]:
    """Stemmer for a language code/name, or None when unsupported
    (the caller passes tokens through, like sb_stemmer_new -> NULL)."""
    lang = (lang or "").lower()
    lang = _ALIASES.get(lang, lang)
    fn = _STEMMERS.get(lang)
    if fn is None:
        return None
    # Tokens repeat heavily within and across documents: memoize.
    return lru_cache(maxsize=65536)(fn)
