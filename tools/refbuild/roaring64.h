/*
 * Offline stand-in for CRoaring's roaring64 API (the reference's
 * vendored submodule is uninitialized and this environment has no
 * network).  Implements exactly the subset the reference uses
 * (index/idxterm.c doc bitmaps, query/search.c boolean set algebra
 * + result iteration) over SORTED uint64 dynamic arrays: appends of
 * increasing doc ids are O(1), set ops are linear merges, contains
 * is a binary search -- the same asymptotics CRoaring achieves on
 * this workload (documented in PARITY_AB.md; index-build and parity
 * comparisons are unaffected, search-time comparisons are
 * approximate to the extent this differs from real CRoaring).
 */

#ifndef _ROARING64_STUB_H_
#define _ROARING64_STUB_H_

#include <stdint.h>
#include <stdbool.h>
#include <stddef.h>

typedef struct roaring64_bitmap_s roaring64_bitmap_t;
typedef struct roaring64_iterator_s roaring64_iterator_t;

roaring64_bitmap_t *roaring64_bitmap_create(void);
void roaring64_bitmap_free(roaring64_bitmap_t *);
roaring64_bitmap_t *roaring64_bitmap_copy(const roaring64_bitmap_t *);

void roaring64_bitmap_add(roaring64_bitmap_t *, uint64_t);
bool roaring64_bitmap_remove(roaring64_bitmap_t *, uint64_t);
bool roaring64_bitmap_contains(const roaring64_bitmap_t *, uint64_t);
uint64_t roaring64_bitmap_get_cardinality(const roaring64_bitmap_t *);

void roaring64_bitmap_and_inplace(roaring64_bitmap_t *,
    const roaring64_bitmap_t *);
void roaring64_bitmap_or_inplace(roaring64_bitmap_t *,
    const roaring64_bitmap_t *);
void roaring64_bitmap_andnot_inplace(roaring64_bitmap_t *,
    const roaring64_bitmap_t *);

roaring64_iterator_t *roaring64_iterator_create(
    const roaring64_bitmap_t *);
void roaring64_iterator_free(roaring64_iterator_t *);
bool roaring64_iterator_has_value(const roaring64_iterator_t *);
uint64_t roaring64_iterator_value(const roaring64_iterator_t *);
bool roaring64_iterator_advance(roaring64_iterator_t *);

#endif
