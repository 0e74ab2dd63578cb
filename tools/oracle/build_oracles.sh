#!/usr/bin/env bash
# Build the reference-libopus oracle binaries used by the test suite.
#
# Everything is built OUT of tree from the read-only reference at
# $OPUS_REF (default /root/reference/opus).  Tests skip themselves when
# these binaries are absent, so this script is only needed to run the
# oracle-gated tests.  No binary artifacts are committed to the repo;
# the committed .txt files under tools/oracle/ are golden outputs
# captured from these helpers (regenerate with: helper > name.txt).
set -euo pipefail
cd "$(dirname "$0")"

OPUS_REF=${OPUS_REF:-/root/reference/opus}
JOBS=${JOBS:-$(nproc)}

# 1. main libopus build (programs incl. opus_demo / opus_compare)
if [ ! -x build/opus_demo ]; then
  cmake "$OPUS_REF" -B build -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DOPUS_BUILD_PROGRAMS=ON -DOPUS_BUILD_TESTING=ON -DOPUS_DRED=OFF \
    > cmake.build.log 2>&1
  ninja -C build -j "$JOBS" opus opus_demo opus_compare \
    > ninja.build.log 2>&1
fi

# 2. custom-modes libopus build (for the OpusCustom oracle)
if [ ! -f build_custom/libopus.a ]; then
  cmake "$OPUS_REF" -B build_custom -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DOPUS_CUSTOM_MODES=ON -DOPUS_BUILD_PROGRAMS=ON -DOPUS_DRED=OFF \
    > cmake.custom.log 2>&1
  ninja -C build_custom -j "$JOBS" opus opus_custom_demo \
    > ninja.custom.log 2>&1
fi

# 3. helper executables: every .c in this directory links the oracle lib.
#    custom_* helpers need the CUSTOM_MODES build; the rest use the
#    default build.  Internal headers come from the reference tree.
INC=(-I"$OPUS_REF"/include -I"$OPUS_REF"/src -I"$OPUS_REF"/celt
     -I"$OPUS_REF"/silk -I"$OPUS_REF"/silk/float -I"$OPUS_REF"/dnn
     -Ibuild)
for src in *.c; do
  bin=${src%.c}
  [ -x "$bin" ] && [ "$bin" -nt "$src" ] && continue
  case "$bin" in
    custom_*) lib=build_custom/libopus.a; def=-DCUSTOM_MODES ;;
    *)        lib=build/libopus.a;        def= ;;
  esac
  extra=
  # the DRED=OFF lib omits the weight-blob parser; compile it in
  [ "$bin" = weights_check ] && extra="$OPUS_REF/dnn/parse_lpcnet_weights.c"
  gcc -O2 -DHAVE_CONFIG_H $def "${INC[@]}" -o "$bin" "$src" $extra "$lib" -lm
done

echo "oracle binaries ready"
