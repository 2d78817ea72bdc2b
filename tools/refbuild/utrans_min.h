/*
 * Minimal unicode/utrans.h stand-in: TensorFlow's vendored ICU
 * headers ship only the `common` module, but the reference's
 * normalizer (utils/utf8.c:84,238) uses three functions from the
 * i18n transliteration C API.  The symbols live in the system
 * libicui18n.so.72; urename.h (vendored, common) carries their
 * version-suffix renames, so only the prototypes are needed here.
 * Signatures per the public ICU C API (stable since ICU 2.x).
 */

#ifndef __UTRANS_MIN_H__
#define __UTRANS_MIN_H__

#include "unicode/utypes.h"
#include "unicode/parseerr.h"

typedef void *UTransliterator;

typedef enum UTransDirection {
	UTRANS_FORWARD,
	UTRANS_REVERSE
} UTransDirection;

U_CAPI UTransliterator * U_EXPORT2
utrans_openU(const UChar *id, int32_t idLength, UTransDirection dir,
    const UChar *rules, int32_t rulesLength, UParseError *parseError,
    UErrorCode *pErrorCode);

U_CAPI void U_EXPORT2
utrans_close(UTransliterator *trans);

U_CAPI void U_EXPORT2
utrans_transUChars(const UTransliterator *trans, UChar *text,
    int32_t *textLength, int32_t textCapacity, int32_t start,
    int32_t *limit, UErrorCode *status);

#endif
