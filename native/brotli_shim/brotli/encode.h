/* Minimal encoder API declarations (see types.h for provenance note). */
#ifndef FPV_BROTLI_SHIM_ENCODE_H_
#define FPV_BROTLI_SHIM_ENCODE_H_

#include "types.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef enum BrotliEncoderMode {
  BROTLI_MODE_GENERIC = 0,
  BROTLI_MODE_TEXT = 1,
  BROTLI_MODE_FONT = 2
} BrotliEncoderMode;

#define BROTLI_DEFAULT_QUALITY 11
#define BROTLI_DEFAULT_WINDOW 22
#define BROTLI_DEFAULT_MODE BROTLI_MODE_GENERIC

BROTLI_BOOL BrotliEncoderCompress(int quality, int lgwin, BrotliEncoderMode mode,
                                  size_t input_size, const uint8_t* input_buffer,
                                  size_t* encoded_size, uint8_t* encoded_buffer);

size_t BrotliEncoderMaxCompressedSize(size_t input_size);

#ifdef __cplusplus
}
#endif

#endif /* FPV_BROTLI_SHIM_ENCODE_H_ */
