/* Offline yyjson stand-in: see yyjson.h in this directory. */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>

#include "yyjson.h"

typedef enum {
	YY_NULL, YY_BOOL, YY_UINT, YY_REAL, YY_STR, YY_ARR, YY_OBJ
} yy_type;

struct yyjson_mut_val {
	yy_type type;
	union {
		bool b;
		uint64_t u;
		double d;
		const char *s;		/* NUL-terminated */
		struct {
			yyjson_mut_val **items;	/* arr: values;
						   obj: key,val pairs */
			size_t n;		/* logical entries */
			size_t cap;
		};
	};
};

struct yyjson_mut_doc {
	yyjson_mut_val *root;
	/* Everything allocated for this doc, freed together. */
	void **blocks;
	size_t nblocks, capblocks;
};

struct yyjson_doc {
	yyjson_mut_doc *inner;
};

static void *
doc_alloc(yyjson_mut_doc *doc, size_t size)
{
	void *p = calloc(1, size);

	if (doc->nblocks == doc->capblocks) {
		doc->capblocks = doc->capblocks ? doc->capblocks * 2 : 64;
		doc->blocks = realloc(doc->blocks,
		    doc->capblocks * sizeof(void *));
	}
	doc->blocks[doc->nblocks++] = p;
	return p;
}

static yyjson_mut_val *
new_val(yyjson_mut_doc *doc, yy_type t)
{
	yyjson_mut_val *v = doc_alloc(doc, sizeof(*v));

	v->type = t;
	return v;
}

yyjson_mut_doc *
yyjson_mut_doc_new(void *alc)
{
	(void)alc;
	return calloc(1, sizeof(yyjson_mut_doc));
}

void
yyjson_mut_doc_free(yyjson_mut_doc *doc)
{
	if (doc == NULL)
		return;
	for (size_t i = 0; i < doc->nblocks; i++)
		free(doc->blocks[i]);
	free(doc->blocks);
	free(doc);
}

void
yyjson_mut_doc_set_root(yyjson_mut_doc *doc, yyjson_mut_val *root)
{
	doc->root = root;
}

yyjson_mut_val *
yyjson_mut_doc_get_root(yyjson_mut_doc *doc)
{
	return doc->root;
}

yyjson_mut_val *
yyjson_mut_obj(yyjson_mut_doc *doc)
{
	return new_val(doc, YY_OBJ);
}

yyjson_mut_val *
yyjson_mut_arr(yyjson_mut_doc *doc)
{
	return new_val(doc, YY_ARR);
}

yyjson_mut_val *
yyjson_mut_str(yyjson_mut_doc *doc, const char *s)
{
	yyjson_mut_val *v = new_val(doc, YY_STR);

	v->s = s;
	return v;
}

yyjson_mut_val *
yyjson_mut_strcpy(yyjson_mut_doc *doc, const char *s)
{
	yyjson_mut_val *v = new_val(doc, YY_STR);
	char *copy = doc_alloc(doc, strlen(s) + 1);

	strcpy(copy, s);
	v->s = copy;
	return v;
}

yyjson_mut_val *
yyjson_mut_uint(yyjson_mut_doc *doc, uint64_t u)
{
	yyjson_mut_val *v = new_val(doc, YY_UINT);

	v->u = u;
	return v;
}

yyjson_mut_val *
yyjson_mut_real(yyjson_mut_doc *doc, double d)
{
	yyjson_mut_val *v = new_val(doc, YY_REAL);

	v->d = d;
	return v;
}

yyjson_mut_val *
yyjson_mut_bool(yyjson_mut_doc *doc, bool b)
{
	yyjson_mut_val *v = new_val(doc, YY_BOOL);

	v->b = b;
	return v;
}

static void
container_push(yyjson_mut_val *c, yyjson_mut_val *v)
{
	if (c->n == c->cap) {
		size_t ncap = c->cap ? c->cap * 2 : 8;
		yyjson_mut_val **ni =
		    realloc(c->items, ncap * sizeof(*ni));
		c->items = ni;
		c->cap = ncap;
	}
	c->items[c->n++] = v;
}

yyjson_mut_val *
yyjson_mut_arr_with_strcpy(yyjson_mut_doc *doc, const char **vals,
    size_t count)
{
	yyjson_mut_val *arr = yyjson_mut_arr(doc);

	for (size_t i = 0; i < count; i++)
		container_push(arr, yyjson_mut_strcpy(doc, vals[i]));
	return arr;
}

bool
yyjson_mut_obj_add(yyjson_mut_val *obj, yyjson_mut_val *key,
    yyjson_mut_val *val)
{
	if (obj == NULL || obj->type != YY_OBJ || key == NULL ||
	    key->type != YY_STR || val == NULL)
		return false;
	container_push(obj, key);
	container_push(obj, val);
	return true;
}

/* NOTE: obj entries are (key, val) pairs, so obj->n is 2 * entries. */

bool
yyjson_mut_obj_add_uint(yyjson_mut_doc *doc, yyjson_mut_val *obj,
    const char *key, uint64_t u)
{
	return yyjson_mut_obj_add(obj, yyjson_mut_strcpy(doc, key),
	    yyjson_mut_uint(doc, u));
}

bool
yyjson_mut_obj_add_real(yyjson_mut_doc *doc, yyjson_mut_val *obj,
    const char *key, double d)
{
	return yyjson_mut_obj_add(obj, yyjson_mut_strcpy(doc, key),
	    yyjson_mut_real(doc, d));
}

yyjson_mut_val *
yyjson_mut_obj_get(yyjson_mut_val *obj, const char *key)
{
	if (obj == NULL || obj->type != YY_OBJ)
		return NULL;
	for (size_t i = 0; i + 1 < obj->n; i += 2) {
		if (strcmp(obj->items[i]->s, key) == 0)
			return obj->items[i + 1];
	}
	return NULL;
}

bool
yyjson_mut_arr_append(yyjson_mut_val *arr, yyjson_mut_val *val)
{
	if (arr == NULL || arr->type != YY_ARR || val == NULL)
		return false;
	container_push(arr, val);
	return true;
}

size_t
yyjson_mut_arr_size(yyjson_mut_val *arr)
{
	return (arr != NULL && arr->type == YY_ARR) ? arr->n : 0;
}

yyjson_mut_val *
yyjson_mut_arr_get(yyjson_mut_val *arr, size_t idx)
{
	if (arr == NULL || arr->type != YY_ARR || idx >= arr->n)
		return NULL;
	return arr->items[idx];
}

bool
yyjson_mut_arr_iter_init(yyjson_mut_val *arr, yyjson_mut_arr_iter *iter)
{
	iter->arr = arr;
	iter->idx = 0;
	return arr != NULL && arr->type == YY_ARR;
}

yyjson_mut_val *
yyjson_mut_arr_iter_next(yyjson_mut_arr_iter *iter)
{
	if (iter->arr == NULL || iter->idx >= iter->arr->n)
		return NULL;
	return iter->arr->items[iter->idx++];
}

bool
yyjson_mut_is_str(yyjson_mut_val *v)
{
	return v != NULL && v->type == YY_STR;
}

bool
yyjson_mut_is_uint(yyjson_mut_val *v)
{
	return v != NULL && v->type == YY_UINT;
}

bool
yyjson_mut_is_bool(yyjson_mut_val *v)
{
	return v != NULL && v->type == YY_BOOL;
}

const char *
yyjson_mut_get_str(yyjson_mut_val *v)
{
	return yyjson_mut_is_str(v) ? v->s : NULL;
}

uint64_t
yyjson_mut_get_uint(yyjson_mut_val *v)
{
	return yyjson_mut_is_uint(v) ? v->u : 0;
}

double
yyjson_mut_get_real(yyjson_mut_val *v)
{
	if (v == NULL)
		return 0.0;
	if (v->type == YY_REAL)
		return v->d;
	if (v->type == YY_UINT)
		return (double)v->u;
	return 0.0;
}

bool
yyjson_mut_get_bool(yyjson_mut_val *v)
{
	return yyjson_mut_is_bool(v) ? v->b : false;
}

/*
 * Writer.
 */

typedef struct {
	char *buf;
	size_t len, cap;
} wbuf_t;

static void
wput(wbuf_t *w, const char *s, size_t n)
{
	if (w->len + n + 1 > w->cap) {
		w->cap = (w->cap ? w->cap * 2 : 256);
		while (w->cap < w->len + n + 1)
			w->cap *= 2;
		w->buf = realloc(w->buf, w->cap);
	}
	memcpy(w->buf + w->len, s, n);
	w->len += n;
	w->buf[w->len] = '\0';
}

static void
wstr(wbuf_t *w, const char *s)
{
	wput(w, "\"", 1);
	for (const char *p = s; *p; p++) {
		char esc[8];
		switch (*p) {
		case '"': wput(w, "\\\"", 2); break;
		case '\\': wput(w, "\\\\", 2); break;
		case '\n': wput(w, "\\n", 2); break;
		case '\t': wput(w, "\\t", 2); break;
		case '\r': wput(w, "\\r", 2); break;
		default:
			if ((unsigned char)*p < 0x20) {
				snprintf(esc, sizeof(esc), "\\u%04x", *p);
				wput(w, esc, 6);
			} else {
				wput(w, p, 1);
			}
		}
	}
	wput(w, "\"", 1);
}

static void
windent(wbuf_t *w, bool pretty, int depth)
{
	if (!pretty)
		return;
	wput(w, "\n", 1);
	for (int i = 0; i < depth; i++)
		wput(w, "    ", 4);
}

static void
wval(wbuf_t *w, yyjson_mut_val *v, bool pretty, int depth)
{
	char num[64];

	if (v == NULL) {
		wput(w, "null", 4);
		return;
	}
	switch (v->type) {
	case YY_NULL:
		wput(w, "null", 4);
		break;
	case YY_BOOL:
		if (v->b)
			wput(w, "true", 4);
		else
			wput(w, "false", 5);
		break;
	case YY_UINT:
		snprintf(num, sizeof(num), "%llu",
		    (unsigned long long)v->u);
		wput(w, num, strlen(num));
		break;
	case YY_REAL:
		snprintf(num, sizeof(num), "%.17g", v->d);
		wput(w, num, strlen(num));
		break;
	case YY_STR:
		wstr(w, v->s);
		break;
	case YY_ARR:
		wput(w, "[", 1);
		for (size_t i = 0; i < v->n; i++) {
			if (i)
				wput(w, ",", 1);
			windent(w, pretty, depth + 1);
			wval(w, v->items[i], pretty, depth + 1);
		}
		if (v->n)
			windent(w, pretty, depth);
		wput(w, "]", 1);
		break;
	case YY_OBJ:
		wput(w, "{", 1);
		for (size_t i = 0; i + 1 < v->n; i += 2) {
			if (i)
				wput(w, ",", 1);
			windent(w, pretty, depth + 1);
			wstr(w, v->items[i]->s);
			wput(w, pretty ? ": " : ":", pretty ? 2 : 1);
			wval(w, v->items[i + 1], pretty, depth + 1);
		}
		if (v->n)
			windent(w, pretty, depth);
		wput(w, "}", 1);
		break;
	}
}

char *
yyjson_mut_write(yyjson_mut_doc *doc, uint32_t flg, size_t *len)
{
	wbuf_t w = { 0 };

	wval(&w, doc->root, (flg & YYJSON_WRITE_PRETTY) != 0, 0);
	if (w.buf == NULL)
		w.buf = strdup("null");
	if (len != NULL)
		*len = w.len;
	return w.buf;
}

bool
yyjson_mut_write_file(const char *path, yyjson_mut_doc *doc,
    uint32_t flg, void *alc, yyjson_write_err *err)
{
	size_t len;
	char *s = yyjson_mut_write(doc, flg, &len);
	FILE *f;

	(void)alc;
	if ((f = fopen(path, "w")) == NULL) {
		free(s);
		if (err != NULL) {
			err->code = 1;
			err->msg = "fopen failed";
		}
		return false;
	}
	fwrite(s, 1, len, f);
	fclose(f);
	free(s);
	return true;
}

/*
 * Reader: minimal recursive-descent JSON.
 */

typedef struct {
	const char *p;
	const char *end;
	yyjson_mut_doc *doc;
	bool error;
} rd_t;

static void
rskip(rd_t *r)
{
	while (r->p < r->end && isspace((unsigned char)*r->p))
		r->p++;
}

static yyjson_mut_val *rval(rd_t *r);

static yyjson_mut_val *
rstring(rd_t *r)
{
	wbuf_t w = { 0 };
	yyjson_mut_val *v;

	r->p++;			/* opening quote */
	while (r->p < r->end && *r->p != '"') {
		if (*r->p == '\\' && r->p + 1 < r->end) {
			char c = r->p[1];
			char out;
			switch (c) {
			case 'n': out = '\n'; break;
			case 't': out = '\t'; break;
			case 'r': out = '\r'; break;
			case 'b': out = '\b'; break;
			case 'f': out = '\f'; break;
			case 'u':
				/* params files are ASCII; decode BMP
				 * escapes to '?' conservatively. */
				out = '?';
				r->p += 4;
				break;
			default: out = c;
			}
			wput(&w, &out, 1);
			r->p += 2;
		} else {
			wput(&w, r->p, 1);
			r->p++;
		}
	}
	if (r->p >= r->end) {
		r->error = true;
		free(w.buf);
		return NULL;
	}
	r->p++;			/* closing quote */
	v = yyjson_mut_strcpy(r->doc, w.buf ? w.buf : "");
	free(w.buf);
	return v;
}

static yyjson_mut_val *
rval(rd_t *r)
{
	rskip(r);
	if (r->p >= r->end) {
		r->error = true;
		return NULL;
	}
	if (*r->p == '{') {
		yyjson_mut_val *obj = yyjson_mut_obj(r->doc);
		r->p++;
		rskip(r);
		if (r->p < r->end && *r->p == '}') {
			r->p++;
			return obj;
		}
		for (;;) {
			yyjson_mut_val *key, *val;
			rskip(r);
			if (r->p >= r->end || *r->p != '"') {
				r->error = true;
				return NULL;
			}
			key = rstring(r);
			rskip(r);
			if (r->p >= r->end || *r->p != ':') {
				r->error = true;
				return NULL;
			}
			r->p++;
			val = rval(r);
			if (r->error)
				return NULL;
			yyjson_mut_obj_add(obj, key, val);
			rskip(r);
			if (r->p < r->end && *r->p == ',') {
				r->p++;
				continue;
			}
			if (r->p < r->end && *r->p == '}') {
				r->p++;
				return obj;
			}
			r->error = true;
			return NULL;
		}
	}
	if (*r->p == '[') {
		yyjson_mut_val *arr = yyjson_mut_arr(r->doc);
		r->p++;
		rskip(r);
		if (r->p < r->end && *r->p == ']') {
			r->p++;
			return arr;
		}
		for (;;) {
			yyjson_mut_val *val = rval(r);
			if (r->error)
				return NULL;
			yyjson_mut_arr_append(arr, val);
			rskip(r);
			if (r->p < r->end && *r->p == ',') {
				r->p++;
				continue;
			}
			if (r->p < r->end && *r->p == ']') {
				r->p++;
				return arr;
			}
			r->error = true;
			return NULL;
		}
	}
	if (*r->p == '"')
		return rstring(r);
	if (strncmp(r->p, "true", 4) == 0) {
		r->p += 4;
		return yyjson_mut_bool(r->doc, true);
	}
	if (strncmp(r->p, "false", 5) == 0) {
		r->p += 5;
		return yyjson_mut_bool(r->doc, false);
	}
	if (strncmp(r->p, "null", 4) == 0) {
		r->p += 4;
		return new_val(r->doc, YY_NULL);
	}
	/* number */
	{
		char *endp;
		double d = strtod(r->p, &endp);
		if (endp == r->p) {
			r->error = true;
			return NULL;
		}
		bool integral = (*r->p != '-');
		for (const char *q = r->p; q < endp && integral; q++) {
			if (*q == '.' || *q == 'e' || *q == 'E')
				integral = false;
		}
		r->p = endp;
		if (integral && d >= 0)
			return yyjson_mut_uint(r->doc, (uint64_t)d);
		return yyjson_mut_real(r->doc, d);
	}
}

yyjson_doc *
yyjson_read_opts(char *dat, size_t len, uint32_t flg, void *alc,
    yyjson_read_err *err)
{
	rd_t r = { .p = dat, .end = dat + len };
	yyjson_doc *doc;

	(void)flg;
	(void)alc;
	r.doc = yyjson_mut_doc_new(NULL);
	r.doc->root = rval(&r);
	rskip(&r);
	if (r.error || r.doc->root == NULL) {
		yyjson_mut_doc_free(r.doc);
		if (err != NULL) {
			err->code = 1;
			err->msg = "parse error";
			err->pos = (size_t)(r.p - dat);
		}
		return NULL;
	}
	doc = malloc(sizeof(*doc));
	doc->inner = r.doc;
	if (err != NULL) {
		err->code = 0;
		err->msg = NULL;
	}
	return doc;
}

yyjson_doc *
yyjson_read_file(const char *path, uint32_t flg, void *alc,
    yyjson_read_err *err)
{
	FILE *f = fopen(path, "r");
	char *buf;
	long n;
	yyjson_doc *doc;

	if (f == NULL) {
		if (err != NULL) {
			err->code = 1;
			err->msg = "fopen failed";
			err->pos = 0;
		}
		return NULL;
	}
	fseek(f, 0, SEEK_END);
	n = ftell(f);
	fseek(f, 0, SEEK_SET);
	buf = malloc(n + 1);
	if (fread(buf, 1, n, f) != (size_t)n) {
		fclose(f);
		free(buf);
		if (err != NULL) {
			err->code = 1;
			err->msg = "fread failed";
			err->pos = 0;
		}
		return NULL;
	}
	fclose(f);
	buf[n] = '\0';
	doc = yyjson_read_opts(buf, n, flg, alc, err);
	free(buf);
	return doc;
}

void
yyjson_doc_free(yyjson_doc *doc)
{
	if (doc != NULL) {
		yyjson_mut_doc_free(doc->inner);
		free(doc);
	}
}

static yyjson_mut_val *
copy_val(yyjson_mut_doc *dst, yyjson_mut_val *v)
{
	yyjson_mut_val *c;

	switch (v->type) {
	case YY_STR:
		return yyjson_mut_strcpy(dst, v->s);
	case YY_ARR:
		c = yyjson_mut_arr(dst);
		for (size_t i = 0; i < v->n; i++)
			container_push(c, copy_val(dst, v->items[i]));
		return c;
	case YY_OBJ:
		c = yyjson_mut_obj(dst);
		for (size_t i = 0; i < v->n; i++)
			container_push(c, copy_val(dst, v->items[i]));
		return c;
	default:
		c = new_val(dst, v->type);
		memcpy(&c->u, &v->u, sizeof(v->u));
		return c;
	}
}

yyjson_mut_doc *
yyjson_doc_mut_copy(yyjson_doc *doc, void *alc)
{
	yyjson_mut_doc *m;

	(void)alc;
	if (doc == NULL || doc->inner == NULL)
		return NULL;
	m = yyjson_mut_doc_new(NULL);
	if (doc->inner->root != NULL)
		m->root = copy_val(m, doc->inner->root);
	return m;
}
