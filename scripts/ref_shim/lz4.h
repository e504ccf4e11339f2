/* Minimal shim: the reference only uses the lz4frame.h API; FindLZ4.cmake
   merely probes for lz4.h's existence. Version matches liblz4.so.1.9.x. */
#ifndef LZ4_H_SHIM
#define LZ4_H_SHIM
#define LZ4_VERSION_MAJOR   1
#define LZ4_VERSION_MINOR   9
#define LZ4_VERSION_RELEASE 4
#endif
