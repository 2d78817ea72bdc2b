/*
 * multisearch: in-process multi-query driver for the reference engine.
 *
 * The reference's own CLI (utils/benchmark.c) runs ONE query per
 * invocation, paying the full index load (mmap + in-memory map /
 * BK-tree rebuild) every time -- fine at 20k docs, hours at 1M.  This
 * driver loads the index once and runs every query from a file, which
 * is the in-process serving shape the reference's library API is
 * designed for (nxs_index_search, src/query/search.c:285).
 *
 * Output: one JSON line per query (the reference's own
 * nxs_resp_tojson), then a final line
 *   multisearch: load=<ms> search_total=<ms> n=<N>
 *
 * Usage: multisearch BASEDIR INDEX QUERYFILE [limit]
 *        multisearch BASEDIR INDEX --ingest DOCFILE
 *
 * --ingest reads one document per line (doc_id = 1-based line
 * number) and adds them through nxs_index_add -- the same
 * line-per-doc corpus both engines consume, so the build timing has
 * no per-file open()/readdir overhead on either side.  Prints
 *   multisearch: ingest=<ms> n=<N>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include <nxs.h>

static double
now_ms(void)
{
	struct timespec ts;
	clock_gettime(CLOCK_MONOTONIC, &ts);
	return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

int
main(int argc, char **argv)
{
	if (argc < 4) {
		fprintf(stderr,
		    "usage: %s BASEDIR INDEX QUERYFILE [limit]\n", argv[0]);
		return 1;
	}
	const char *basedir = argv[1], *name = argv[2], *qfile = argv[3];
	unsigned limit = (argc > 4) ? (unsigned)atoi(argv[4]) : 10;

	nxs_t *nxs = nxs_open(basedir);
	if (nxs == NULL) {
		fprintf(stderr, "nxs_open failed\n");
		return 1;
	}
	double t0 = now_ms();
	nxs_index_t *idx = nxs_index_open(nxs, name);
	if (idx == NULL) {
		fprintf(stderr, "index open failed: %s\n",
		    nxs_get_error(nxs, NULL));
		return 1;
	}
	double load_ms = now_ms() - t0;

	if (strcmp(qfile, "--ingest") == 0 && argc > 4) {
		FILE *df = fopen(argv[4], "r");
		if (df == NULL) {
			perror(argv[4]);
			return 1;
		}
		static char doc[1 << 20];
		uint64_t doc_id = 0;
		double i0 = now_ms();
		while (fgets(doc, sizeof(doc), df) != NULL) {
			size_t len = strlen(doc);
			while (len > 0 && (doc[len - 1] == '\n' ||
			    doc[len - 1] == '\r'))
				doc[--len] = '\0';
			doc_id++;
			if (len == 0)
				continue;
			if (nxs_index_add(idx, NULL, doc_id, doc,
			    len) != 0) {
				fprintf(stderr, "add %llu failed: %s\n",
				    (unsigned long long)doc_id,
				    nxs_get_error(nxs, NULL));
				return 1;
			}
		}
		fclose(df);
		printf("multisearch: ingest=%.1f n=%llu\n",
		    now_ms() - i0, (unsigned long long)doc_id);
		nxs_index_close(idx);
		nxs_close(nxs);
		return 0;
	}

	nxs_params_t *params = nxs_params_create();
	nxs_params_set_uint(params, "limit", limit);

	FILE *f = fopen(qfile, "r");
	if (f == NULL) {
		perror(qfile);
		return 1;
	}
	char line[4096];
	double search_ms = 0;
	unsigned n = 0;
	while (fgets(line, sizeof(line), f) != NULL) {
		size_t len = strlen(line);
		while (len > 0 &&
		    (line[len - 1] == '\n' || line[len - 1] == '\r'))
			line[--len] = '\0';
		if (len == 0)
			continue;
		double q0 = now_ms();
		nxs_resp_t *resp =
		    nxs_index_search(idx, params, line, len);
		search_ms += now_ms() - q0;
		if (resp == NULL) {
			printf("{\"error\": \"%s\"}\n",
			    nxs_get_error(nxs, NULL));
		} else {
			size_t rlen;
			const char *json = nxs_resp_tojson(resp, &rlen);
			fwrite(json, 1, rlen, stdout);
			fputc('\n', stdout);
			nxs_resp_release(resp);
		}
		n++;
	}
	fclose(f);
	printf("multisearch: load=%.0f search_total=%.1f n=%u\n",
	    load_ms, search_ms, n);
	nxs_params_release(params);
	nxs_index_close(idx);
	nxs_close(nxs);
	return 0;
}
