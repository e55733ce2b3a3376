#!/usr/bin/env bash
# xcframework assembly for the ultragroth-tpu mobile client — twin of
# /root/reference/scripts/create_xcframework.sh (which bundles the
# on-device prover as UltraGroth.xcframework).  The TPU framework's iOS
# deliverable is the remote-prover client (native/ultragroth_remote.c,
# same prover.h ABI, proofs from the TPU proof server), built per Apple
# platform and assembled with `xcodebuild -create-xcframework`.
#
# Must run on macOS with Xcode; on other hosts it reports what is
# missing and exits (the reference's NDK-check behaviour).
set -euo pipefail
cd "$(dirname "$0")/.."

XCFWNAME="UltraGrothTPU"
if ! command -v xcodebuild >/dev/null 2>&1; then
  echo "xcodebuild not found: xcframework assembly needs a macOS host" >&2
  exit 1
fi

OUT=dist/apple
mkdir -p "$OUT"
LIBS=()
for sdk_arch in "iphoneos arm64" "iphonesimulator arm64" "macosx arm64"; do
  set -- $sdk_arch
  sdk=$1; arch=$2
  sdkpath=$(xcrun --sdk "$sdk" --show-sdk-path)
  mkdir -p "$OUT/$sdk"
  xcrun --sdk "$sdk" clang -O2 -std=c99 -arch "$arch" -isysroot "$sdkpath" \
      -fPIC -shared -o "$OUT/$sdk/libultragroth_remote.dylib" \
      native/ultragroth_remote.c
  LIBS+=(-library "$OUT/$sdk/libultragroth_remote.dylib"
         -headers native/include)
done

rm -rf "$OUT/$XCFWNAME.xcframework"
xcodebuild -create-xcframework "${LIBS[@]}" \
    -output "$OUT/$XCFWNAME.xcframework"
echo "created $OUT/$XCFWNAME.xcframework"
