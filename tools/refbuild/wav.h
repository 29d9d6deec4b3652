// Minimal stand-in for AudioDSPTools' dsp/wav.h (the submodule is not vendored
// in this environment). Implements exactly the surface the reference's
// tools/render.cpp:131-134 uses: dsp::wav::Load + GetMsgForLoadReturnCode.
// PCM normalization matches this repo's Python/native codec
// (native/nam_native.cpp: 16-bit /2^15, 24-bit /2^23, 32-bit /2^31) so the
// compiled-reference oracle and our render CLI read identical float input.
#pragma once

#include <string>
#include <vector>

namespace dsp
{
namespace wav
{
enum class LoadReturnCode
{
  SUCCESS = 0,
  ERROR_NOT_FOUND,
  ERROR_INVALID_FILE,
  ERROR_UNSUPPORTED_FORMAT,
};

LoadReturnCode Load(const char* fileName, std::vector<float>& audio, double& sampleRate);

std::string GetMsgForLoadReturnCode(LoadReturnCode code);
} // namespace wav
} // namespace dsp
