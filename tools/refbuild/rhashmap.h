/*
 * Offline stand-in for rmind/rhashmap (the reference's vendored
 * submodule is uninitialized and this environment has no network).
 * Same public API/semantics as used by the reference
 * (index/idxterm.c, dtmap.c): open-addressing hash map keyed by
 * (ptr, len) byte strings, RHM_NOCOPY keeps only the key pointer,
 * rhashmap_put returns the EXISTING value when the key is already
 * present (insert-if-absent).
 */

#ifndef _RHASHMAP_STUB_H_
#define _RHASHMAP_STUB_H_

#include <stddef.h>

#define RHM_NOCOPY	0x01
#define RHM_NONCRYPTO	0x02

typedef struct rhashmap rhashmap_t;

rhashmap_t *rhashmap_create(size_t initial, unsigned flags);
void rhashmap_destroy(rhashmap_t *);

void *rhashmap_get(rhashmap_t *, const void *key, size_t len);
void *rhashmap_put(rhashmap_t *, const void *key, size_t len, void *val);
void *rhashmap_del(rhashmap_t *, const void *key, size_t len);

#endif
