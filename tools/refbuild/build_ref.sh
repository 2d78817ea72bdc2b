#!/bin/sh -e
# Build the reference C engine for the offline head-to-head benchmark
# (PARITY_AB.md).  The image lacks re2c, lemon, libstemmer, libtool
# and ICU dev headers, so:
#   - query/scan.c + query/grammar.c are replaced by the hand-written
#     genparse.c (same token rules and grammar semantics);
#   - libstemmer is an identity stub (both engines run stem-free);
#   - ICU headers come from TensorFlow's vendored 69.1 tree with the
#     entry-point rename suffix retargeted at the system ICU 72 libs
#     (the C API used -- ucasemap/unorm2/ubrk/ustring/utrans -- is
#     stable across 69..72); utrans.h (i18n, not vendored) is a
#     minimal local prototype header.
# The reference tree itself is READ-ONLY and never modified: the
# build happens in a disposable copy under $BUILD.
#
# Usage: build_ref.sh [BUILD_DIR]   (default /tmp/refbuild)

REF=/root/reference/src
BUILD=${1:-/tmp/refbuild}
HERE=$(dirname "$(realpath "$0")")
TFICU=/opt/venv/lib/python3.12/site-packages/tensorflow/include/external/icu/icu4c/source/common
ICULIB=/usr/lib/x86_64-linux-gnu

rm -rf "$BUILD"
mkdir -p "$BUILD"
cp -r "$REF" "$BUILD/src"
chmod -R u+w "$BUILD/src"
cp "$HERE/genparse.c" "$BUILD/src/query/"
cp "$HERE/libstemmer.h" "$HERE/stemmer_stub.c" "$BUILD/src/utils/"

mkdir -p "$BUILD/icu/unicode"
cp "$TFICU"/unicode/*.h "$BUILD/icu/unicode/"
sed -i 's/#define U_ICU_VERSION_SUFFIX _69/#define U_ICU_VERSION_SUFFIX _72/' \
    "$BUILD/icu/unicode/uvernum.h"
cp "$HERE/utrans_min.h" "$BUILD/icu/unicode/utrans.h"

# The reference's vendored submodules (rhashmap, CRoaring, yyjson)
# are uninitialized and cannot be fetched offline: drop in this
# directory's API-compatible stand-ins (see each file's header for
# the implementation notes / performance caveats).
mkdir -p "$BUILD/shim/roaring"
cp "$HERE/rhashmap.h" "$HERE/rhashmap.c" "$BUILD/shim/"
cp "$HERE/yyjson.h" "$HERE/yyjson.c" "$BUILD/shim/"
cp "$HERE/roaring64.c" "$BUILD/shim/"
cp "$HERE/roaring64.h" "$BUILD/shim/roaring/roaring64.h"

# Optional one-line bug fix for the A/B control run (PARITY_AB's 8
# excluded divergences): the reference's fuzzy candidate loop never
# updates its running max (idxterm.c:239-242 -- `term_total` stays 0),
# so its pick among tolerance-2 candidates is BK-tree traversal-order
# dependent instead of the documented most-popular term.  With
# NXS_REF_FIX_FUZZY=1 the DISPOSABLE COPY gets the obvious fix so the
# head-to-head can verify that the repo matches the *intended*
# semantics 512/512 (the pristine tree is never touched).
if [ "${NXS_REF_FIX_FUZZY:-0}" = "1" ]; then
    python3 - "$BUILD/src/index/idxterm.c" <<'EOF'
import sys
p = sys.argv[1]
src = open(p).read()
broken = """	while ((iterm = deque_pop_back(results)) != NULL) {
		if (idxterm_get_total(idx, iterm) > term_total) {
			term = iterm;
		}
	}"""
fixed = """	while ((iterm = deque_pop_back(results)) != NULL) {
		uint64_t t = idxterm_get_total(idx, iterm);
		if (t > term_total) {
			term_total = t;
			term = iterm;
		}
	}"""
assert broken in src, "idxterm.c candidate loop changed upstream"
open(p, "w").write(src.replace(broken, fixed))
print("applied fuzzy-pick fix to the disposable copy")
EOF
fi

cd "$BUILD/src"
CFLAGS="-std=gnu11 -O2 -g -DNDEBUG -D_POSIX_C_SOURCE=200809L \
    -D_GNU_SOURCE -D_DEFAULT_SOURCE \
    -I core/ -I index/ -I algo/ -I query/ -I utils/ \
    -I $BUILD/shim -I $BUILD/icu"

SRCS="core/nxs.c core/tokenizer.c core/filters.c core/filters_builtin.c \
    core/params.c core/results.c \
    query/expr.c query/query.c query/genparse.c query/search.c \
    index/idxmap.c index/idxterm.c index/idxdoc.c index/terms.c \
    index/dtmap.c \
    algo/ranking.c algo/heap.c algo/deque.c algo/levdist.c algo/bktree.c \
    utils/strbuf.c utils/mmrw.c utils/utf8.c utils/log.c utils/utils.c \
    utils/stemmer_stub.c \
    $BUILD/shim/rhashmap.c $BUILD/shim/roaring64.c $BUILD/shim/yyjson.c"

# shellcheck disable=SC2086
gcc $CFLAGS $SRCS utils/benchmark.c \
    "$ICULIB/libicuuc.so.72" "$ICULIB/libicui18n.so.72" \
    "$ICULIB/libicuio.so.72" "$ICULIB/libicudata.so.72" \
    -lm -lpthread -o nxsearch_test

# In-process multi-query driver (loads the index once; the serving
# shape of the reference's library API) for the scaled head-to-head.
cp "$HERE/multisearch.c" "$BUILD/src/"
# shellcheck disable=SC2086
gcc $CFLAGS $SRCS multisearch.c \
    "$ICULIB/libicuuc.so.72" "$ICULIB/libicui18n.so.72" \
    "$ICULIB/libicuio.so.72" "$ICULIB/libicudata.so.72" \
    -lm -lpthread -o multisearch

echo "built: $BUILD/src/nxsearch_test $BUILD/src/multisearch"
