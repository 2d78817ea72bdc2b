// Native test driver for the text pipeline, built with ASan/UBSan
// (the reference builds every test with the sanitizers enabled,
// src/Makefile:62-65).  Exercises segmentation, stemming, the
// single-token filter, batch processing, buffer-growth paths, and a
// deterministic fuzz loop.  Python-level behavioral parity is covered
// by tests/test_native.py; this binary exists to run the C++ under
// the sanitizers without dragging the Python/JAX stack along.

#include <cassert>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* nxs_text_ctx_new(int flags, const char* stopwords, long sw_len);
void nxs_text_ctx_free(void* ctx);
long nxs_text_process(void* ctx, const char* text, long len,
                      char* out_tokens, long out_cap, int* out_counts,
                      long counts_cap, long* out_seen, long* out_nbytes);
long nxs_text_filter_token(void* ctx, const char* value, long len,
                           char* out, long out_cap);
long nxs_text_process_batch(void* ctx, const char* texts,
                            const long* doc_off, long n_docs,
                            char* out_table, long table_cap,
                            long* out_table_n, long* out_table_bytes,
                            unsigned* out_pairs, long pairs_cap,
                            long* out_doc_ptr, unsigned* out_seen);
}

static std::vector<std::string> run_tokens(void* ctx, const char* text) {
  char out[1 << 16];
  int counts[4096];
  long seen = 0, nbytes = 0;
  long n = nxs_text_process(ctx, text, (long)strlen(text), out,
                            sizeof(out), counts, 4096, &seen, &nbytes);
  assert(n >= 0);
  std::vector<std::string> tokens;
  const char* p = out;
  for (long i = 0; i < n; i++) {
    tokens.emplace_back(p);
    p += tokens.back().size() + 1;
  }
  return tokens;
}

static void expect_tokens(void* ctx, const char* text,
                          std::vector<std::string> want) {
  auto got = run_tokens(ctx, text);
  if (got != want) {
    fprintf(stderr, "FAIL tokens for: %s\n got:", text);
    for (auto& t : got) fprintf(stderr, " %s", t.c_str());
    fprintf(stderr, "\n");
    assert(false);
  }
}

static void expect_stem(void* ctx, const char* word, const char* want) {
  char out[256];
  long n = nxs_text_filter_token(ctx, word, (long)strlen(word), out,
                                 sizeof(out));
  assert(n >= 0);
  std::string got(out, (size_t)n);
  if (got != want) {
    fprintf(stderr, "FAIL stem %s: got %s want %s\n", word, got.c_str(),
            want);
    assert(false);
  }
}

int main() {
  // Normalizer + stemmer, no stopwords.
  void* ctx = nxs_text_ctx_new(1 | 4, nullptr, 0);

  // UAX#29 shapes (the reference's t_tokenize cases).
  expect_tokens(ctx, "We will play with I.B.M.",
                {"we", "will", "play", "with", "i.b.m"});
  expect_tokens(ctx, "snake_case stays", {"snake_cas", "stay"});
  expect_tokens(ctx, "doesn't it's", {"doesn't", "it"});
  expect_tokens(ctx, "... , ;", {});
  expect_tokens(ctx, "", {});

  // Porter2 goldens (published algorithm samples).
  expect_stem(ctx, "consign", "consign");
  expect_stem(ctx, "consigned", "consign");
  expect_stem(ctx, "consigning", "consign");
  expect_stem(ctx, "knack", "knack");
  expect_stem(ctx, "knotted", "knot");
  expect_stem(ctx, "nationalization", "nation");
  expect_stem(ctx, "generously", "generous");
  expect_stem(ctx, "sky", "sky");
  expect_stem(ctx, "dying", "die");
  expect_stem(ctx, "happily", "happili");
  expect_stem(ctx, "cats", "cat");
  expect_stem(ctx, "ties", "tie");
  expect_stem(ctx, "cries", "cri");

  // Stopwords.
  const char sw[] = "the\nof\nand\n";
  void* ctx_sw = nxs_text_ctx_new(1 | 2 | 4, sw, (long)strlen(sw));
  expect_tokens(ctx_sw, "The dog and the cat", {"dog", "cat"});
  nxs_text_ctx_free(ctx_sw);

  // Batch API.
  {
    const char* docs[] = {"cat dog cat", "dog bird", "... ,", "naive"};
    std::string blob;
    std::vector<long> off{0};
    for (const char* d : docs) {
      blob += d;
      off.push_back((long)blob.size());
    }
    char table[4096];
    unsigned pairs[256];
    long doc_ptr[5];
    unsigned seen[4];
    long tn = 0, tb = 0;
    long rc = nxs_text_process_batch(ctx, blob.data(), off.data(), 4,
                                     table, sizeof(table), &tn, &tb,
                                     pairs, 256, doc_ptr, seen);
    assert(rc == 0);
    assert(tn == 4);  // cat, dog, bird, naiv
    assert(seen[0] == 3 && seen[1] == 2 && seen[2] == 0 && seen[3] == 1);
    assert(doc_ptr[0] == 0 && doc_ptr[1] == 2);  // (cat,2)(dog,1)
    assert(pairs[0] == 0 && pairs[1] == 2);      // cat x2
  }

  // Non-ASCII rejection.
  {
    char out[64];
    int counts[8];
    long seen = 0, nbytes = 0;
    long n = nxs_text_process(ctx, "caf\xc3\xa9", 5, out, sizeof(out),
                              counts, 8, &seen, &nbytes);
    assert(n == -1);
    assert(nxs_text_filter_token(ctx, "caf\xc3\xa9", 5, out, 64) == -1);
  }

  // Buffer-too-small paths.
  {
    char out[4];
    int counts[1];
    long seen = 0, nbytes = 0;
    long n = nxs_text_process(ctx, "alpha beta gamma", 16, out, 4,
                              counts, 1, &seen, &nbytes);
    assert(n == -2);
  }

  // Deterministic fuzz: random ASCII soup through every entry point.
  {
    unsigned long s = 12345;
    auto next = [&]() { s = s * 6364136223846793005UL + 1442695040888963407UL;
                        return (unsigned)(s >> 33); };
    char buf[512];
    char out[1 << 14];
    int counts[1024];
    for (int trial = 0; trial < 20000; trial++) {
      int len = (int)(next() % 120);
      for (int i = 0; i < len; i++)
        buf[i] = (char)(next() % 128);
      long seen = 0, nbytes = 0;
      nxs_text_process(ctx, buf, len, out, sizeof(out), counts, 1024,
                       &seen, &nbytes);
      nxs_text_filter_token(ctx, buf, len, out, sizeof(out));
    }
  }

  // Batch-path fuzz: random multi-document batches, including
  // deliberately tiny output buffers (the -2 grow-and-retry path),
  // exercising the interner/memo across growths under the sanitizers.
  {
    unsigned long s = 777;
    auto next = [&]() { s = s * 6364136223846793005UL + 1442695040888963407UL;
                        return (unsigned)(s >> 33); };
    for (int trial = 0; trial < 400; trial++) {
      int n_docs = 1 + (int)(next() % 6);
      std::string blob;
      std::vector<long> off{0};
      for (int d = 0; d < n_docs; d++) {
        int len = (int)(next() % 200);
        for (int i = 0; i < len; i++)
          blob += (char)(next() % 128);
        off.push_back((long)blob.size());
      }
      long table_cap = 64 << (trial % 10);
      long pairs_cap = 32 << (trial % 10);
      std::vector<char> table((size_t)table_cap);
      std::vector<unsigned> pairs((size_t)pairs_cap);
      std::vector<long> doc_ptr((size_t)n_docs + 1);
      std::vector<unsigned> seen((size_t)n_docs);
      long tn = 0, tb = 0;
      long rc = nxs_text_process_batch(
          ctx, blob.data(), off.data(), n_docs, table.data(), table_cap,
          &tn, &tb, pairs.data(), pairs_cap, doc_ptr.data(), seen.data());
      assert(rc == 0 || rc == -2);
      if (rc == 0) {
        for (int d = 0; d < n_docs; d++)
          assert(doc_ptr[d] <= doc_ptr[d + 1]);
        assert(2 * doc_ptr[n_docs] <= pairs_cap);
      }
    }
  }

  nxs_text_ctx_free(ctx);
  printf("OK\n");
  return 0;
}
