#!/usr/bin/env bash
# Packaging twin of the reference's mobile library-assembly scripts
# (/root/reference/scripts/create_xcframework.sh, build_ios_systems.sh,
# build_android_system.sh): those merge per-arch static libs into one
# distributable artifact for app embedding.  The TPU-serving equivalent is
# a versioned linux-<arch> bundle of the C-ABI shared libraries + public
# headers + a pkg-config file, ready to drop next to an existing
# rapidsnark/ultragroth mobile-wrapper build (same symbols, prover.h /
# verifier.h twins), plus an optional Python wheel.
#
# Usage:  scripts/package_library.sh [outdir]   (default: dist/)
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/dist}"
ARCH="$(uname -m)"
VERSION="$(sed -n 's/^version *= *"\(.*\)"/\1/p' "$REPO/pyproject.toml" | head -1)"
VERSION="${VERSION:-0.0.0}"
NAME="ultragroth-tpu-${VERSION}-linux-${ARCH}"
STAGE="$OUT/$NAME"

echo "== building native libraries"
make -C "$REPO/native"

echo "== staging $STAGE"
rm -rf "$STAGE"
mkdir -p "$STAGE/lib" "$STAGE/include/ultragroth" "$STAGE/lib/pkgconfig"
cp "$REPO/ultragroth_tpu/_native/libultragroth.so" \
   "$REPO/ultragroth_tpu/_native/libultragroth_io.so" \
   "$REPO/ultragroth_tpu/_native/libultragroth_remote.so" "$STAGE/lib/"
cp "$REPO"/native/include/ultragroth/*.h "$STAGE/include/ultragroth/"

cat > "$STAGE/lib/pkgconfig/ultragroth.pc" <<EOF
prefix=\${pcfiledir}/../..
libdir=\${prefix}/lib
includedir=\${prefix}/include

Name: ultragroth-tpu
Description: TPU-native Groth16/UltraGroth prover and verifier (C ABI)
Version: ${VERSION}
Libs: -L\${libdir} -lultragroth
Cflags: -I\${includedir}
EOF

cat > "$STAGE/README.md" <<'EOF'
# ultragroth-tpu C library bundle

Contents:
  lib/libultragroth.so     prover + verifier C ABI (see include/)
  lib/libultragroth_io.so  mmap/binfile/keccak helpers
  lib/libultragroth_remote.so  mobile client: same prover.h ABI, proofs
                           fetched from the ultragroth_tpu proof server
                           (set ULTRAGROTH_SERVER=host:port)
  include/ultragroth/      prover.h, verifier.h (reference-ABI twins)
  lib/pkgconfig/           pkg-config metadata

The prover embeds the Python/JAX runtime: the target machine needs the
`ultragroth_tpu` Python package importable (pip install the wheel or add
the repo to PYTHONPATH) and a JAX backend (TPU for production, CPU works
functionally).  Symbols and buffer conventions match the reference
libultragroth, so existing FFI wrappers link unchanged.
EOF

tar -C "$OUT" -czf "$OUT/$NAME.tar.gz" "$NAME"
echo "== wrote $OUT/$NAME.tar.gz"

if [ "${WHEEL:-0}" = "1" ]; then
    echo "== building Python wheel"
    (cd "$REPO" && python3 -m pip wheel --no-deps -w "$OUT" .) \
        || echo "wheel build unavailable (pip offline?); skipped"
fi

echo "done"
