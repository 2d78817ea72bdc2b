/*
 * Offline stand-in for yyjson (the reference's vendored submodule is
 * uninitialized and this environment has no network).  Implements
 * exactly the subset the reference uses (core/params.c persistence,
 * core/results.c response building): mutable docs with objects,
 * arrays, strings, uints, reals and bools, a minimal JSON reader,
 * and a writer with an optional pretty mode.  Only used for the
 * head-to-head benchmark build; JSON handling is not on either
 * engine's hot path.
 */

#ifndef _YYJSON_STUB_H_
#define _YYJSON_STUB_H_

#include <stdint.h>
#include <stdbool.h>
#include <stddef.h>
#include <stdlib.h>	/* the real yyjson.h exposes this transitively */

#define YYJSON_WRITE_PRETTY 0x01u

typedef struct yyjson_mut_doc yyjson_mut_doc;
typedef struct yyjson_mut_val yyjson_mut_val;
/* The immutable doc is a thin wrapper: read -> mut_copy -> free. */
typedef struct yyjson_doc yyjson_doc;

typedef struct yyjson_read_err {
	int code;
	const char *msg;
	size_t pos;
} yyjson_read_err;

typedef struct yyjson_write_err {
	int code;
	const char *msg;
} yyjson_write_err;

typedef struct yyjson_mut_arr_iter {
	yyjson_mut_val *arr;
	size_t idx;
} yyjson_mut_arr_iter;

/* reading */
yyjson_doc *yyjson_read_file(const char *path, uint32_t flg, void *alc,
    yyjson_read_err *err);
yyjson_doc *yyjson_read_opts(char *dat, size_t len, uint32_t flg,
    void *alc, yyjson_read_err *err);
void yyjson_doc_free(yyjson_doc *);
yyjson_mut_doc *yyjson_doc_mut_copy(yyjson_doc *, void *alc);

/* mutable doc */
yyjson_mut_doc *yyjson_mut_doc_new(void *alc);
void yyjson_mut_doc_free(yyjson_mut_doc *);
void yyjson_mut_doc_set_root(yyjson_mut_doc *, yyjson_mut_val *);
yyjson_mut_val *yyjson_mut_doc_get_root(yyjson_mut_doc *);

/* values */
yyjson_mut_val *yyjson_mut_obj(yyjson_mut_doc *);
yyjson_mut_val *yyjson_mut_arr(yyjson_mut_doc *);
yyjson_mut_val *yyjson_mut_str(yyjson_mut_doc *, const char *);
yyjson_mut_val *yyjson_mut_strcpy(yyjson_mut_doc *, const char *);
yyjson_mut_val *yyjson_mut_uint(yyjson_mut_doc *, uint64_t);
yyjson_mut_val *yyjson_mut_real(yyjson_mut_doc *, double);
yyjson_mut_val *yyjson_mut_bool(yyjson_mut_doc *, bool);
yyjson_mut_val *yyjson_mut_arr_with_strcpy(yyjson_mut_doc *,
    const char **vals, size_t count);

/* object/array ops */
bool yyjson_mut_obj_add(yyjson_mut_val *obj, yyjson_mut_val *key,
    yyjson_mut_val *val);
bool yyjson_mut_obj_add_uint(yyjson_mut_doc *, yyjson_mut_val *obj,
    const char *key, uint64_t);
bool yyjson_mut_obj_add_real(yyjson_mut_doc *, yyjson_mut_val *obj,
    const char *key, double);
yyjson_mut_val *yyjson_mut_obj_get(yyjson_mut_val *obj, const char *key);
bool yyjson_mut_arr_append(yyjson_mut_val *arr, yyjson_mut_val *val);
size_t yyjson_mut_arr_size(yyjson_mut_val *arr);
yyjson_mut_val *yyjson_mut_arr_get(yyjson_mut_val *arr, size_t idx);

bool yyjson_mut_arr_iter_init(yyjson_mut_val *arr,
    yyjson_mut_arr_iter *iter);
yyjson_mut_val *yyjson_mut_arr_iter_next(yyjson_mut_arr_iter *iter);

#define yyjson_mut_arr_foreach(arr, idx, max, val) \
	for ((idx) = 0, (max) = yyjson_mut_arr_size(arr), \
	    (val) = yyjson_mut_arr_get(arr, 0); \
	    (idx) < (max); \
	    (idx)++, (val) = yyjson_mut_arr_get(arr, idx))

/* inspectors */
bool yyjson_mut_is_str(yyjson_mut_val *);
bool yyjson_mut_is_uint(yyjson_mut_val *);
bool yyjson_mut_is_bool(yyjson_mut_val *);
const char *yyjson_mut_get_str(yyjson_mut_val *);
uint64_t yyjson_mut_get_uint(yyjson_mut_val *);
double yyjson_mut_get_real(yyjson_mut_val *);
bool yyjson_mut_get_bool(yyjson_mut_val *);

/* writing */
char *yyjson_mut_write(yyjson_mut_doc *, uint32_t flg, size_t *len);
bool yyjson_mut_write_file(const char *path, yyjson_mut_doc *,
    uint32_t flg, void *alc, yyjson_write_err *err);

#endif
