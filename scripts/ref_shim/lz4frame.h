/* Minimal ABI-compatible declarations for the system liblz4.so.1 (the
   distro ships the runtime library without development headers).  Layout
   of LZ4F_preferences_t matches the stable public lz4frame.h ABI. */
#ifndef LZ4FRAME_H_SHIM
#define LZ4FRAME_H_SHIM
#include <stddef.h>
#if defined(__cplusplus)
extern "C" {
#endif

#define LZ4F_VERSION 100

typedef struct LZ4F_cctx_s LZ4F_cctx;
typedef struct LZ4F_dctx_s LZ4F_dctx;
typedef size_t LZ4F_errorCode_t;

typedef struct {
  unsigned blockSizeID;          /* LZ4F_blockSizeID_t */
  unsigned blockMode;            /* LZ4F_blockMode_t */
  unsigned contentChecksumFlag;  /* LZ4F_contentChecksum_t */
  unsigned frameType;            /* LZ4F_frameType_t */
  unsigned long long contentSize;
  unsigned dictID;
  unsigned blockChecksumFlag;    /* LZ4F_blockChecksum_t */
} LZ4F_frameInfo_t;

typedef struct {
  LZ4F_frameInfo_t frameInfo;
  int compressionLevel;
  unsigned autoFlush;
  unsigned favorDecSpeed;
  unsigned reserved[3];
} LZ4F_preferences_t;

typedef struct {
  unsigned stableDst;
  unsigned skipChecksums;
  unsigned reserved1;
  unsigned reserved0;
} LZ4F_decompressOptions_t;

typedef struct {
  unsigned stableSrc;
  unsigned reserved[3];
} LZ4F_compressOptions_t;

unsigned LZ4F_isError(LZ4F_errorCode_t code);
const char* LZ4F_getErrorName(LZ4F_errorCode_t code);

LZ4F_errorCode_t LZ4F_createCompressionContext(LZ4F_cctx** cctxPtr, unsigned version);
LZ4F_errorCode_t LZ4F_freeCompressionContext(LZ4F_cctx* cctx);
size_t LZ4F_compressBound(size_t srcSize, const LZ4F_preferences_t* prefsPtr);
size_t LZ4F_compressBegin(LZ4F_cctx* cctx, void* dstBuffer, size_t dstCapacity,
                          const LZ4F_preferences_t* prefsPtr);
size_t LZ4F_compressUpdate(LZ4F_cctx* cctx, void* dstBuffer, size_t dstCapacity,
                           const void* srcBuffer, size_t srcSize,
                           const LZ4F_compressOptions_t* cOptPtr);
size_t LZ4F_compressEnd(LZ4F_cctx* cctx, void* dstBuffer, size_t dstCapacity,
                        const LZ4F_compressOptions_t* cOptPtr);

LZ4F_errorCode_t LZ4F_createDecompressionContext(LZ4F_dctx** dctxPtr, unsigned version);
LZ4F_errorCode_t LZ4F_freeDecompressionContext(LZ4F_dctx* dctx);
void LZ4F_resetDecompressionContext(LZ4F_dctx* dctx);
size_t LZ4F_decompress(LZ4F_dctx* dctx, void* dstBuffer, size_t* dstSizePtr,
                       const void* srcBuffer, size_t* srcSizePtr,
                       const LZ4F_decompressOptions_t* dOptPtr);

#if defined(__cplusplus)
}
#endif
#endif
