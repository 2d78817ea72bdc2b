"""Compatibility shim: the ICU ctypes binding was promoted from a
test helper to a runtime module (nxsearch_tpu/text/icu_ctypes.py) so
the engine can use real ICU word-break for dictionary-segmented
scripts (CJK/Thai); tests import through this alias."""

from nxsearch_tpu.text.icu_ctypes import *          # noqa: F401,F403
from nxsearch_tpu.text.icu_ctypes import (          # noqa: F401
    IcuNfkcCasefold, IcuTransliterator, available, icu_word_tokens)
