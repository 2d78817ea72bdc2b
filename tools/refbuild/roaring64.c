/* Offline roaring64 stand-in: see roaring64.h in this directory. */

#include <stdlib.h>
#include <string.h>

#include "roaring/roaring64.h"

struct roaring64_bitmap_s {
	uint64_t *v;		/* sorted, unique */
	size_t n;
	size_t cap;
};

struct roaring64_iterator_s {
	const roaring64_bitmap_t *bm;
	size_t at;
};

roaring64_bitmap_t *
roaring64_bitmap_create(void)
{
	return calloc(1, sizeof(roaring64_bitmap_t));
}

void
roaring64_bitmap_free(roaring64_bitmap_t *b)
{
	if (b != NULL) {
		free(b->v);
		free(b);
	}
}

roaring64_bitmap_t *
roaring64_bitmap_copy(const roaring64_bitmap_t *b)
{
	roaring64_bitmap_t *c = roaring64_bitmap_create();

	c->n = c->cap = b->n;
	if (b->n) {
		c->v = malloc(b->n * sizeof(uint64_t));
		memcpy(c->v, b->v, b->n * sizeof(uint64_t));
	}
	return c;
}

/* Index of the first element >= x. */
static size_t
lower_bound(const roaring64_bitmap_t *b, uint64_t x)
{
	size_t lo = 0, hi = b->n;

	while (lo < hi) {
		size_t mid = (lo + hi) / 2;
		if (b->v[mid] < x)
			lo = mid + 1;
		else
			hi = mid;
	}
	return lo;
}

void
roaring64_bitmap_add(roaring64_bitmap_t *b, uint64_t x)
{
	size_t i;

	/* Fast path: ids are added in increasing order. */
	if (b->n == 0 || x > b->v[b->n - 1]) {
		i = b->n;
	} else {
		i = lower_bound(b, x);
		if (i < b->n && b->v[i] == x)
			return;
	}
	if (b->n == b->cap) {
		b->cap = b->cap ? b->cap * 2 : 16;
		b->v = realloc(b->v, b->cap * sizeof(uint64_t));
	}
	memmove(b->v + i + 1, b->v + i, (b->n - i) * sizeof(uint64_t));
	b->v[i] = x;
	b->n++;
}

bool
roaring64_bitmap_remove(roaring64_bitmap_t *b, uint64_t x)
{
	size_t i = lower_bound(b, x);

	if (i >= b->n || b->v[i] != x)
		return false;
	memmove(b->v + i, b->v + i + 1, (b->n - i - 1) * sizeof(uint64_t));
	b->n--;
	return true;
}

bool
roaring64_bitmap_contains(const roaring64_bitmap_t *b, uint64_t x)
{
	size_t i = lower_bound(b, x);
	return i < b->n && b->v[i] == x;
}

uint64_t
roaring64_bitmap_get_cardinality(const roaring64_bitmap_t *b)
{
	return b->n;
}

void
roaring64_bitmap_and_inplace(roaring64_bitmap_t *a,
    const roaring64_bitmap_t *b)
{
	size_t i = 0, j = 0, o = 0;

	while (i < a->n && j < b->n) {
		if (a->v[i] < b->v[j]) {
			i++;
		} else if (a->v[i] > b->v[j]) {
			j++;
		} else {
			a->v[o++] = a->v[i];
			i++, j++;
		}
	}
	a->n = o;
}

void
roaring64_bitmap_or_inplace(roaring64_bitmap_t *a,
    const roaring64_bitmap_t *b)
{
	uint64_t *out = malloc((a->n + b->n) * sizeof(uint64_t));
	size_t i = 0, j = 0, o = 0;

	while (i < a->n && j < b->n) {
		if (a->v[i] < b->v[j]) {
			out[o++] = a->v[i++];
		} else if (a->v[i] > b->v[j]) {
			out[o++] = b->v[j++];
		} else {
			out[o++] = a->v[i];
			i++, j++;
		}
	}
	while (i < a->n)
		out[o++] = a->v[i++];
	while (j < b->n)
		out[o++] = b->v[j++];
	free(a->v);
	a->v = out;
	a->n = a->cap = o;
}

void
roaring64_bitmap_andnot_inplace(roaring64_bitmap_t *a,
    const roaring64_bitmap_t *b)
{
	size_t i = 0, j = 0, o = 0;

	while (i < a->n) {
		while (j < b->n && b->v[j] < a->v[i])
			j++;
		if (j < b->n && b->v[j] == a->v[i])
			i++;
		else
			a->v[o++] = a->v[i++];
	}
	a->n = o;
}

roaring64_iterator_t *
roaring64_iterator_create(const roaring64_bitmap_t *b)
{
	roaring64_iterator_t *it = malloc(sizeof(*it));

	it->bm = b;
	it->at = 0;
	return it;
}

void
roaring64_iterator_free(roaring64_iterator_t *it)
{
	free(it);
}

bool
roaring64_iterator_has_value(const roaring64_iterator_t *it)
{
	return it->at < it->bm->n;
}

uint64_t
roaring64_iterator_value(const roaring64_iterator_t *it)
{
	return it->bm->v[it->at];
}

bool
roaring64_iterator_advance(roaring64_iterator_t *it)
{
	if (it->at < it->bm->n)
		it->at++;
	return it->at < it->bm->n;
}
