#include "wav.h"

#include <cstdint>
#include <cstring>
#include <fstream>

namespace dsp
{
namespace wav
{
namespace
{
uint32_t ReadU32(const uint8_t* p)
{
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) | (static_cast<uint32_t>(p[2]) << 16)
         | (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t ReadU16(const uint8_t* p)
{
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}
} // namespace

LoadReturnCode Load(const char* fileName, std::vector<float>& audio, double& sampleRate)
{
  std::ifstream in(fileName, std::ios::binary);
  if (!in.is_open())
    return LoadReturnCode::ERROR_NOT_FOUND;
  std::vector<uint8_t> data((std::istreambuf_iterator<char>(in)), std::istreambuf_iterator<char>());
  if (data.size() < 44 || std::memcmp(data.data(), "RIFF", 4) != 0 || std::memcmp(data.data() + 8, "WAVE", 4) != 0)
    return LoadReturnCode::ERROR_INVALID_FILE;

  size_t pos = 12;
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* raw = nullptr;
  size_t rawSize = 0;
  bool haveFmt = false;
  while (pos + 8 <= data.size())
  {
    const uint8_t* chunk = data.data() + pos;
    const uint32_t size = ReadU32(chunk + 4);
    const uint8_t* body = chunk + 8;
    if (pos + 8 + size > data.size())
      break;
    if (std::memcmp(chunk, "fmt ", 4) == 0 && size >= 16)
    {
      format = ReadU16(body);
      channels = ReadU16(body + 2);
      rate = ReadU32(body + 4);
      bits = ReadU16(body + 14);
      // WAVE_FORMAT_EXTENSIBLE: real code is the first 2 bytes of the SubFormat GUID
      if (format == 0xFFFE && size >= 26)
        format = ReadU16(body + 24);
      haveFmt = true;
    }
    else if (std::memcmp(chunk, "data", 4) == 0)
    {
      raw = body;
      rawSize = size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!haveFmt || raw == nullptr)
    return LoadReturnCode::ERROR_INVALID_FILE;
  if (channels != 1)
    return LoadReturnCode::ERROR_UNSUPPORTED_FORMAT; // render.cpp is mono-only anyway

  sampleRate = static_cast<double>(rate);
  audio.clear();

  if (format == 3 && bits == 32)
  {
    const size_t n = rawSize / 4;
    audio.resize(n);
    std::memcpy(audio.data(), raw, n * 4);
    return LoadReturnCode::SUCCESS;
  }
  if (format != 1)
    return LoadReturnCode::ERROR_UNSUPPORTED_FORMAT;

  if (bits == 16)
  {
    const size_t n = rawSize / 2;
    audio.resize(n);
    for (size_t i = 0; i < n; i++)
    {
      int16_t v;
      std::memcpy(&v, raw + 2 * i, 2);
      audio[i] = static_cast<float>(v) / 32768.0f;
    }
  }
  else if (bits == 24)
  {
    const size_t n = rawSize / 3;
    audio.resize(n);
    for (size_t i = 0; i < n; i++)
    {
      int32_t v = (static_cast<int32_t>(raw[3 * i]) << 8) | (static_cast<int32_t>(raw[3 * i + 1]) << 16)
                  | (static_cast<int32_t>(raw[3 * i + 2]) << 24);
      v >>= 8; // sign-extended 24-bit value
      audio[i] = static_cast<float>(v) / 8388608.0f;
    }
  }
  else if (bits == 32)
  {
    const size_t n = rawSize / 4;
    audio.resize(n);
    for (size_t i = 0; i < n; i++)
    {
      int32_t v;
      std::memcpy(&v, raw + 4 * i, 4);
      audio[i] = static_cast<float>(static_cast<double>(v) / 2147483648.0);
    }
  }
  else
  {
    return LoadReturnCode::ERROR_UNSUPPORTED_FORMAT;
  }
  return LoadReturnCode::SUCCESS;
}

std::string GetMsgForLoadReturnCode(LoadReturnCode code)
{
  switch (code)
  {
    case LoadReturnCode::SUCCESS: return "success";
    case LoadReturnCode::ERROR_NOT_FOUND: return "file not found";
    case LoadReturnCode::ERROR_INVALID_FILE: return "invalid WAV file";
    case LoadReturnCode::ERROR_UNSUPPORTED_FORMAT: return "unsupported WAV format";
  }
  return "unknown";
}
} // namespace wav
} // namespace dsp
