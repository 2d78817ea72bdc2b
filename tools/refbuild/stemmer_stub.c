/* Identity libstemmer stand-in: see libstemmer.h in this directory. */

#include <stdlib.h>
#include <string.h>

#include "libstemmer.h"

struct sb_stemmer {
	sb_symbol *buf;
	int len;
	int cap;
};

struct sb_stemmer *
sb_stemmer_new(const char *algorithm, const char *charenc)
{
	(void)algorithm;
	(void)charenc;
	struct sb_stemmer *s = calloc(1, sizeof(*s));
	return s;
}

void
sb_stemmer_delete(struct sb_stemmer *s)
{
	if (s != NULL) {
		free(s->buf);
		free(s);
	}
}

const sb_symbol *
sb_stemmer_stem(struct sb_stemmer *s, const sb_symbol *word, int size)
{
	if (size + 1 > s->cap) {
		s->cap = size + 1;
		s->buf = realloc(s->buf, s->cap);
	}
	memcpy(s->buf, word, size);
	s->buf[size] = '\0';
	s->len = size;
	return s->buf;
}

int
sb_stemmer_length(struct sb_stemmer *s)
{
	return s->len;
}
