/* Minimal declarations of the stable public brotli C API, written for this
 * project because the system ships only runtime libraries (libbrotli*.so.1)
 * without development headers.  Matches the ABI documented in RFC 7932's
 * reference implementation (github.com/google/brotli, BSD-licensed API). */
#ifndef FPV_BROTLI_SHIM_TYPES_H_
#define FPV_BROTLI_SHIM_TYPES_H_

#include <stddef.h>
#include <stdint.h>

typedef int BROTLI_BOOL;
#define BROTLI_TRUE 1
#define BROTLI_FALSE 0

typedef void* (*brotli_alloc_func)(void* opaque, size_t size);
typedef void (*brotli_free_func)(void* opaque, void* address);

#endif /* FPV_BROTLI_SHIM_TYPES_H_ */
