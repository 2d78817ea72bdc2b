/* Offline rhashmap stand-in: see rhashmap.h in this directory.
 * Open addressing, linear probing, FNV-1a, pow2 capacity, backward-
 * shift deletion (no tombstone decay). */

#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "rhashmap.h"

typedef struct {
	const void *key;	/* NULL = empty */
	void *val;
	size_t len;
	uint64_t hash;
	char *own;		/* owned key copy (no RHM_NOCOPY) */
} rh_slot_t;

struct rhashmap {
	rh_slot_t *slots;
	size_t cap;		/* power of two */
	size_t used;
	unsigned flags;
};

static uint64_t
rh_hash(const void *key, size_t len)
{
	const unsigned char *p = key;
	uint64_t h = 0xcbf29ce484222325ULL;

	for (size_t i = 0; i < len; i++) {
		h ^= p[i];
		h *= 0x100000001b3ULL;
	}
	return h | 1;		/* never 0 */
}

rhashmap_t *
rhashmap_create(size_t initial, unsigned flags)
{
	rhashmap_t *m = calloc(1, sizeof(*m));

	if (m == NULL)
		return NULL;
	m->cap = 64;
	while (m->cap < initial * 2)
		m->cap <<= 1;
	m->flags = flags;
	m->slots = calloc(m->cap, sizeof(rh_slot_t));
	if (m->slots == NULL) {
		free(m);
		return NULL;
	}
	return m;
}

void
rhashmap_destroy(rhashmap_t *m)
{
	if (m == NULL)
		return;
	for (size_t i = 0; i < m->cap; i++)
		free(m->slots[i].own);
	free(m->slots);
	free(m);
}

static rh_slot_t *
rh_lookup(rhashmap_t *m, const void *key, size_t len, uint64_t h)
{
	size_t i = h & (m->cap - 1);

	while (m->slots[i].key != NULL) {
		rh_slot_t *s = &m->slots[i];
		if (s->hash == h && s->len == len &&
		    memcmp(s->key, key, len) == 0)
			return s;
		i = (i + 1) & (m->cap - 1);
	}
	return &m->slots[i];	/* empty slot where it would insert */
}

void *
rhashmap_get(rhashmap_t *m, const void *key, size_t len)
{
	rh_slot_t *s = rh_lookup(m, key, len, rh_hash(key, len));
	return s->key != NULL ? s->val : NULL;
}

static void
rh_grow(rhashmap_t *m)
{
	rh_slot_t *old = m->slots;
	size_t ocap = m->cap;

	m->cap <<= 1;
	m->slots = calloc(m->cap, sizeof(rh_slot_t));
	for (size_t i = 0; i < ocap; i++) {
		if (old[i].key == NULL)
			continue;
		rh_slot_t *d = rh_lookup(m, old[i].key, old[i].len,
		    old[i].hash);
		*d = old[i];
	}
	free(old);
}

void *
rhashmap_put(rhashmap_t *m, const void *key, size_t len, void *val)
{
	uint64_t h = rh_hash(key, len);
	rh_slot_t *s = rh_lookup(m, key, len, h);

	if (s->key != NULL)
		return s->val;	/* insert-if-absent semantics */
	if ((m->used + 1) * 4 > m->cap * 3) {
		rh_grow(m);
		s = rh_lookup(m, key, len, h);
	}
	if (m->flags & RHM_NOCOPY) {
		s->key = key;
	} else {
		s->own = malloc(len);
		memcpy(s->own, key, len);
		s->key = s->own;
	}
	s->len = len;
	s->hash = h;
	s->val = val;
	m->used++;
	return val;
}

void *
rhashmap_del(rhashmap_t *m, const void *key, size_t len)
{
	uint64_t h = rh_hash(key, len);
	rh_slot_t *s = rh_lookup(m, key, len, h);
	void *val;
	size_t i, j, k;

	if (s->key == NULL)
		return NULL;
	val = s->val;
	free(s->own);
	m->used--;

	/* Backward-shift deletion keeps probe chains intact. */
	i = s - m->slots;
	m->slots[i].key = NULL;
	m->slots[i].own = NULL;
	j = i;
	for (;;) {
		j = (j + 1) & (m->cap - 1);
		if (m->slots[j].key == NULL)
			break;
		k = m->slots[j].hash & (m->cap - 1);
		/* Can slot j move into the hole at i? */
		if ((j > i && (k <= i || k > j)) ||
		    (j < i && (k <= i && k > j))) {
			m->slots[i] = m->slots[j];
			m->slots[j].key = NULL;
			m->slots[j].own = NULL;
			i = j;
		}
	}
	return val;
}
