// Self-contained baseline JPEG (ITU-T.81 SOF0) decoder — no libjpeg in the
// image, and the loader needs compressed-shard support for realistic video
// storage densities. Baseline sequential DCT only (the universal default;
// progressive JPEGs are rejected with an error).
#ifndef VIDEOMAMBA_NATIVE_JPEG_H_
#define VIDEOMAMBA_NATIVE_JPEG_H_

#include <cstdint>
#include <string>
#include <vector>

namespace vmjpeg {

// Decodes a baseline JPEG into 8-bit RGB (grayscale replicated to 3
// channels). Returns false and sets *err on malformed/unsupported input.
bool decode_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* width, int* height, std::string* err);

}  // namespace vmjpeg

#endif  // VIDEOMAMBA_NATIVE_JPEG_H_
