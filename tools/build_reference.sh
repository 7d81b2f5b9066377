#!/bin/sh
# Build the reference bwa-mem2 binary (SSE4.1 variant — the one whose
# output our golden fixtures and differential tests mirror) into
# .refbuild/bwa-mem2.ref, enabling:
#   - the slow differential suite (BWAMEM2_TPU_SLOW_TESTS=1 pytest
#     tests/test_scale_ecoli.py): byte-identical index files + bit-identical
#     SE/PE SAM at 4.6Mb scale
#   - a live-measured baseline in bench.py
#
# The vendored snapshot lacks the safestringlib submodule; the reference
# only uses strcpy_s/strcat_s/strncpy_s/memcpy_s, so a minimal
# C11-Annex-K shim is dropped in (verified: the resulting binary
# reproduces the committed golden fixtures byte-for-byte).
set -e
SRC=${1:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
cp -r "$SRC" "$WORK/refsrc"
SS="$WORK/refsrc/ext/safestringlib"
mkdir -p "$SS/include"
cat > "$SS/include/safe_str_lib.h" <<'EOF'
#include <cstdio>
#ifndef SAFE_STR_LIB_SHIM_H
#define SAFE_STR_LIB_SHIM_H
#include <string.h>
#include <stddef.h>
#ifdef __cplusplus
extern "C" {
#endif
typedef int errno_t;
typedef size_t rsize_t;
#ifndef RSIZE_MAX_STR
#define RSIZE_MAX_STR (4UL << 10 << 10)
#endif
static inline errno_t strcpy_s(char *dest, rsize_t dmax, const char *src) {
    if (!dest || !src || dmax == 0) return 1;
    size_t n = strlen(src);
    if (n + 1 > dmax) { dest[0] = 0; return 1; }
    memcpy(dest, src, n + 1);
    return 0;
}
static inline errno_t strcat_s(char *dest, rsize_t dmax, const char *src) {
    if (!dest || !src || dmax == 0) return 1;
    size_t dl = strnlen(dest, dmax);
    if (dl >= dmax) return 1;
    size_t n = strlen(src);
    if (dl + n + 1 > dmax) return 1;
    memcpy(dest + dl, src, n + 1);
    return 0;
}
static inline errno_t strncpy_s(char *dest, rsize_t dmax, const char *src,
                                rsize_t slen) {
    if (!dest || !src || dmax == 0) return 1;
    size_t n = strnlen(src, slen);
    if (n + 1 > dmax) { dest[0] = 0; return 1; }
    memcpy(dest, src, n);
    dest[n] = 0;
    return 0;
}
#ifdef __cplusplus
}
#endif
#endif
EOF
cat > "$SS/include/safe_mem_lib.h" <<'EOF'
#ifndef SAFE_MEM_LIB_SHIM_H
#define SAFE_MEM_LIB_SHIM_H
#include "safe_str_lib.h"
#ifndef RSIZE_MAX_MEM
#define RSIZE_MAX_MEM (256UL << 10 << 10)
#endif
#ifdef __cplusplus
extern "C" {
#endif
static inline errno_t memcpy_s(void *dest, rsize_t dmax, const void *src,
                               rsize_t n) {
    if (!dest || !src || n > dmax) return 1;
    memcpy(dest, src, n);
    return 0;
}
#ifdef __cplusplus
}
#endif
#endif
EOF
( cd "$SS" && g++ -c -x c++ /dev/null -o dummy.o && ar rcs libsafestring.a dummy.o )
( cd "$WORK/refsrc" && make arch=sse41 EXE=bwa-mem2.ref -j8 )
mkdir -p "$REPO/.refbuild"
cp "$WORK/refsrc/bwa-mem2.ref" "$REPO/.refbuild/"
echo "installed $REPO/.refbuild/bwa-mem2.ref"
