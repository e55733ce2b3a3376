#!/usr/bin/env bash
# Android build of the ultragroth-tpu mobile client — twin of
# /root/reference/scripts/build_android_system.sh (which NDK-builds the
# on-device prover).  A TPU framework proves on the TPU service, so the
# Android deliverable is libultragroth_remote: the same prover.h ABI,
# proofs fetched from the proof server (native/ultragroth_remote.c).
#
# Usage: ANDROID_NDK=/path/to/ndk scripts/build_android_system.sh [api]
# Produces dist/android/<abi>/libultragroth_remote.so for all four ABIs
# plus the public headers.
set -euo pipefail
cd "$(dirname "$0")/.."

API="${1:-24}"
NDK_PATH="${ANDROID_NDK:-${NDK_PATH:-}}"
if [ -z "$NDK_PATH" ] || [ ! -d "$NDK_PATH" ]; then
  echo "NDK path not found: set ANDROID_NDK (reference script behaviour)" >&2
  exit 1
fi

HOST_TAG=linux-x86_64
TOOLCHAIN="$NDK_PATH/toolchains/llvm/prebuilt/$HOST_TAG/bin"
OUT=dist/android
mkdir -p "$OUT"

for abi_target in \
    "arm64-v8a aarch64-linux-android" \
    "armeabi-v7a armv7a-linux-androideabi" \
    "x86_64 x86_64-linux-android" \
    "x86 i686-linux-android"; do
  set -- $abi_target
  abi=$1; triple=$2
  cc="$TOOLCHAIN/${triple}${API}-clang"
  if [ ! -x "$cc" ]; then
    echo "skip $abi: $cc not present" >&2
    continue
  fi
  mkdir -p "$OUT/$abi"
  "$cc" -O2 -std=c99 -fPIC -Wall -shared \
      -o "$OUT/$abi/libultragroth_remote.so" native/ultragroth_remote.c
  echo "built $OUT/$abi/libultragroth_remote.so"
done

mkdir -p "$OUT/include"
cp -r native/include/ultragroth "$OUT/include/"
echo "headers -> $OUT/include/ultragroth"
