#!/bin/bash
# Build the reference `flac` binary (from the read-only reference tree) as a
# differential test oracle. Nothing from the reference is copied into this
# repo; the binary is built out-of-tree in ${ORACLE_DIR:-/tmp/flacoracle} and
# tests gracefully skip when the reference tree is unavailable.
set -e
REF=${REF:-/root/reference}
OUT=${ORACLE_DIR:-/tmp/flacoracle}
[ -d "$REF" ] || { echo "reference tree not found at $REF" >&2; exit 2; }
mkdir -p "$OUT"
if [ -x "$OUT/flac" ] && [ "$OUT/flac" -nt "$0" ]; then
  echo "$OUT/flac"
  exit 0
fi
cat > "$OUT/config.h" <<'EOF'
#define FLAC__NO_ASM 1
#define FLAC__ALIGN_MALLOC_DATA 1
#define VERSION "1.2.1"
#define PACKAGE_VERSION "1.2.1"
#define HAVE_INTTYPES_H 1
#define HAVE_STDINT_H 1
#define SIZEOF_VOIDP 8
#define CPU_IS_LITTLE_ENDIAN 1
#define CPU_IS_BIG_ENDIAN 0
#define FLaC__INLINE inline
EOF
CFLAGS="-O2 -w -DHAVE_CONFIG_H=1 -DFLAC__NO_ASM -DFLAC__NO_DLL"
INC="-I$REF/include -I$REF/src/libFLAC/include -I$REF/src/flac -I$REF/src/share -I$REF/include/share -I$REF/src/share/utf8 -I$REF/src/share/replaygain_analysis -I$REF/src/share/replaygain_synthesis -I$REF/src/share/replaygain_synthesis/include -I$OUT"
LIBSRC=$(echo $REF/src/libFLAC/{bitmath,bitreader,bitwriter,cpu,crc,fixed,float,format,lpc,md5,memory,metadata_iterators,metadata_object,stream_decoder,stream_encoder,stream_encoder_framing,window}.c)
FLACSRC=$(echo $REF/src/flac/{analyze,decode,encode,foreign_metadata,local_string_utils,main,utils,vorbiscomment}.c)
METAFLACSRC=$(echo $REF/src/metaflac/*.c)
SHARESRC="$REF/src/share/grabbag/*.c $REF/src/share/replaygain_analysis/*.c $REF/src/share/replaygain_synthesis/*.c $REF/src/share/utf8/utf8.c $REF/src/share/utf8/charset.c $REF/src/share/utf8/iconvert.c $REF/src/share/getopt/getopt.c $REF/src/share/getopt/getopt1.c"
gcc $CFLAGS $INC -o "$OUT/flac" $LIBSRC $FLACSRC $SHARESRC -lm 2> "$OUT/build_flac.log" || { tail -30 "$OUT/build_flac.log" >&2; exit 1; }
gcc $CFLAGS $INC -o "$OUT/metaflac" $LIBSRC $METAFLACSRC $SHARESRC -lm 2> "$OUT/build_metaflac.log" || { tail -30 "$OUT/build_metaflac.log" >&2; exit 1; }
echo "$OUT/flac"
