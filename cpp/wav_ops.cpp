// Native segmented WAV I/O for pb_chime5_tpu.io.audio.
//
// The reference front-end is I/O bound on segment reads of long session
// WAVs (24 channels x 2.5 h, read per-utterance with +-15 s context;
// reference core.py:439-488 via libsndfile).  This extension does the
// header parse + seek + bulk read in C++ and returns raw bytes; the thin
// Python wrapper turns them into NumPy arrays without a copy.
//
// API:
//   read(path, start, stop) -> (bytes, channels, bits, audio_format,
//                               sample_rate)
//       stop == -1 means end of file; frame range is clamped to the file.
//   write(path, bytes, channels, bits, audio_format, sample_rate)
//       writes a canonical 44-byte-header WAV.
//   info(path) -> (num_frames, channels, bits, audio_format, sample_rate)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>

namespace {

struct WavHeader {
  uint16_t audio_format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  int64_t data_offset = 0;
  int64_t data_bytes = 0;

  int64_t bytes_per_frame() const { return channels * bits / 8; }
  int64_t num_frames() const {
    int64_t bpf = bytes_per_frame();
    return bpf ? data_bytes / bpf : 0;
  }
};

struct FileCloser {
  void operator()(FILE* f) const {
    if (f) fclose(f);
  }
};
using FilePtr = std::unique_ptr<FILE, FileCloser>;

bool parse_header(FILE* f, const char* path, WavHeader* h) {
  char magic[12];
  if (fread(magic, 1, 12, f) != 12 || memcmp(magic, "RIFF", 4) != 0 ||
      memcmp(magic + 8, "WAVE", 4) != 0) {
    PyErr_Format(PyExc_ValueError, "%s: not a RIFF/WAVE file", path);
    return false;
  }
  bool have_fmt = false;
  for (;;) {
    char chunk[8];
    if (fread(chunk, 1, 8, f) != 8) {
      PyErr_Format(PyExc_ValueError, "%s: no data chunk found", path);
      return false;
    }
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      unsigned char fmt[40];
      size_t want = size < sizeof(fmt) ? size : sizeof(fmt);
      if (fread(fmt, 1, want, f) != want) {
        PyErr_Format(PyExc_ValueError, "%s: truncated fmt chunk", path);
        return false;
      }
      if (size > want) fseek(f, static_cast<long>(size - want), SEEK_CUR);
      memcpy(&h->audio_format, fmt, 2);
      memcpy(&h->channels, fmt + 2, 2);
      memcpy(&h->sample_rate, fmt + 4, 4);
      memcpy(&h->bits, fmt + 14, 2);
      if (h->audio_format == 0xFFFE && size >= 40) {
        memcpy(&h->audio_format, fmt + 24, 2);  // WAVE_FORMAT_EXTENSIBLE
      }
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      if (!have_fmt) {
        PyErr_Format(PyExc_ValueError, "%s: data before fmt chunk", path);
        return false;
      }
      h->data_offset = ftell(f);
      h->data_bytes = size;
      return true;
    } else {
      fseek(f, static_cast<long>(size + (size & 1)), SEEK_CUR);
    }
  }
}

PyObject* wav_read(PyObject*, PyObject* args) {
  const char* path;
  long long start, stop;
  if (!PyArg_ParseTuple(args, "sLL", &path, &start, &stop)) return nullptr;
  FilePtr f(fopen(path, "rb"));
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  WavHeader h;
  if (!parse_header(f.get(), path, &h)) return nullptr;
  int64_t frames = h.num_frames();
  if (stop < 0 || stop > frames) stop = frames;
  if (start < 0) start = 0;
  if (start > frames) start = frames;
  int64_t count = stop > start ? stop - start : 0;
  int64_t nbytes = count * h.bytes_per_frame();

  PyObject* buf = PyBytes_FromStringAndSize(nullptr, nbytes);
  if (!buf) return nullptr;
  if (nbytes > 0) {
    int64_t got = 0;
    Py_BEGIN_ALLOW_THREADS
    fseeko(f.get(), h.data_offset + start * h.bytes_per_frame(), SEEK_SET);
    got = static_cast<int64_t>(
        fread(PyBytes_AS_STRING(buf), 1, static_cast<size_t>(nbytes),
              f.get()));
    Py_END_ALLOW_THREADS
    if (got != nbytes) {
      // tolerate truncated files: shrink to what was actually read,
      // rounded down to whole frames
      int64_t whole = (got / h.bytes_per_frame()) * h.bytes_per_frame();
      if (_PyBytes_Resize(&buf, whole) != 0) return nullptr;
    }
  }
  return Py_BuildValue("(NHHHI)", buf, h.channels, h.bits, h.audio_format,
                       h.sample_rate);
}

PyObject* wav_info(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  FilePtr f(fopen(path, "rb"));
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  WavHeader h;
  if (!parse_header(f.get(), path, &h)) return nullptr;
  return Py_BuildValue("(LHHHI)", static_cast<long long>(h.num_frames()),
                       h.channels, h.bits, h.audio_format, h.sample_rate);
}

PyObject* wav_write(PyObject*, PyObject* args) {
  const char* path;
  Py_buffer data;
  unsigned short channels, bits, audio_format;
  unsigned int sample_rate;
  if (!PyArg_ParseTuple(args, "sy*HHHI", &path, &data, &channels, &bits,
                        &audio_format, &sample_rate))
    return nullptr;
  FilePtr f(fopen(path, "wb"));
  if (!f) {
    PyBuffer_Release(&data);
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  uint32_t data_bytes = static_cast<uint32_t>(data.len);
  uint32_t byte_rate = sample_rate * channels * bits / 8;
  uint16_t block_align = channels * bits / 8;
  unsigned char header[44];
  memcpy(header, "RIFF", 4);
  uint32_t riff = 36 + data_bytes;
  memcpy(header + 4, &riff, 4);
  memcpy(header + 8, "WAVEfmt ", 8);
  uint32_t fmt_size = 16;
  memcpy(header + 16, &fmt_size, 4);
  memcpy(header + 20, &audio_format, 2);
  memcpy(header + 22, &channels, 2);
  memcpy(header + 24, &sample_rate, 4);
  memcpy(header + 28, &byte_rate, 4);
  memcpy(header + 32, &block_align, 2);
  memcpy(header + 34, &bits, 2);
  memcpy(header + 36, "data", 4);
  memcpy(header + 40, &data_bytes, 4);
  bool ok = false;
  Py_BEGIN_ALLOW_THREADS
  ok = fwrite(header, 1, 44, f.get()) == 44 &&
       fwrite(data.buf, 1, static_cast<size_t>(data.len), f.get()) ==
           static_cast<size_t>(data.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&data);
  if (!ok) {
    PyErr_Format(PyExc_OSError, "short write to %s", path);
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"read", wav_read, METH_VARARGS,
     "read(path, start, stop) -> (bytes, channels, bits, fmt, sample_rate)"},
    {"info", wav_info, METH_VARARGS,
     "info(path) -> (frames, channels, bits, fmt, sample_rate)"},
    {"write", wav_write, METH_VARARGS,
     "write(path, bytes, channels, bits, fmt, sample_rate)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_wav_ops",
    "Native segmented WAV reader/writer.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__wav_ops() { return PyModule_Create(&module); }
