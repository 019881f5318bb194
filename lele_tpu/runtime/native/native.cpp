// _lele_native — native runtime components (CPython C API, no pybind11).
//
// The reference's native layer is Rust (prost ONNX decode, model.rs:26;
// WavReader, examples/sensevoice/src/audio.rs; content-hash weight dedup,
// compiler/mod.rs:1372). TPU equivalents here:
//   scan_initializers(bytes) -> list[(name, dtype, dims, offset, nbytes)]
//       one pass over the protobuf wire format, returning absolute offsets
//       of every initializer's raw_data so Python builds zero-copy numpy
//       views over the mmap'd file without decoding tensor bodies.
//   decode_wav(bytes) -> (float32_mono_bytes, sample_rate)
//       RIFF PCM 8/16/24/32 + IEEE float, channel-averaged.
//   decode_wav_files([path, ...]) -> [(float32_mono_bytes, sr), ...]
//       the batch data loader: file reads + decodes run on a C++ thread
//       pool with the GIL RELEASED — feeding transcribe_batch/serving
//       without serializing audio IO behind Python.
//   content_hash(bytes) -> int   (FNV-1a 64, for blob dedup prepass)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>
#include <string>

namespace {

struct Reader {
  const uint8_t* p;
  size_t len;
  size_t pos = 0;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (pos < len) {
      uint8_t b = p[pos++];
      v |= (uint64_t)(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
      if (shift > 70) break;
    }
    ok = false;
    return 0;
  }

  // Checked length-delimited read: returns payload length only if the whole
  // payload fits in the remaining buffer; marks the reader bad otherwise.
  uint64_t ld_len() {
    uint64_t n = varint();
    if (!ok || n > len - pos) {
      ok = false;
      return 0;
    }
    return n;
  }

  void skip(uint32_t wt) {
    switch (wt) {
      case 0: varint(); break;
      case 1: pos += 8; break;
      case 2: { uint64_t n = ld_len(); pos += n; break; }
      case 5: pos += 4; break;
      default: ok = false;
    }
    if (pos > len) ok = false;
  }
};

struct TensorMeta {
  std::string name;
  int32_t dtype = 0;
  std::vector<int64_t> dims;
  size_t data_off = 0;   // absolute offset of raw_data payload
  size_t data_len = 0;
  bool has_raw = false;
  bool ok = true;
};

// Parse one TensorProto body at [base, base+n); offsets absolute into file.
TensorMeta parse_tensor(const uint8_t* file, size_t base, size_t n) {
  TensorMeta t;
  Reader r{file + base, n};
  while (r.ok && r.pos < r.len) {
    uint64_t tag = r.varint();
    uint32_t fnum = (uint32_t)(tag >> 3), wt = (uint32_t)(tag & 7);
    if (fnum == 1 && wt == 0) {            // dims (unpacked)
      t.dims.push_back((int64_t)r.varint());
    } else if (fnum == 1 && wt == 2) {     // dims (packed)
      uint64_t ln = r.ld_len();
      size_t end = r.pos + ln;
      while (r.ok && r.pos < end) t.dims.push_back((int64_t)r.varint());
    } else if (fnum == 2 && wt == 0) {     // data_type
      t.dtype = (int32_t)r.varint();
    } else if (fnum == 8 && wt == 2) {     // name
      uint64_t ln = r.ld_len();
      if (!r.ok) break;
      t.name.assign((const char*)r.p + r.pos, ln);
      r.pos += ln;
    } else if (fnum == 9 && wt == 2) {     // raw_data
      uint64_t ln = r.ld_len();
      if (!r.ok) break;
      t.data_off = base + r.pos;
      t.data_len = ln;
      t.has_raw = true;
      r.pos += ln;
    } else {
      r.skip(wt);
    }
    if (r.pos > r.len) break;
  }
  t.ok = r.ok;
  return t;
}

// Walk ModelProto → graph(7) → initializer(5); nested subgraphs skipped
// (subgraph initializers are rare; Python path covers them).
bool scan_graph(const uint8_t* file, size_t base, size_t n,
                std::vector<TensorMeta>* out) {
  Reader r{file + base, n};
  while (r.ok && r.pos < r.len) {
    uint64_t tag = r.varint();
    uint32_t fnum = (uint32_t)(tag >> 3), wt = (uint32_t)(tag & 7);
    if (fnum == 5 && wt == 2) {  // initializer: TensorProto
      uint64_t ln = r.ld_len();
      if (!r.ok) break;
      TensorMeta t = parse_tensor(file, base + r.pos, ln);
      if (!t.ok) return false;
      out->push_back(std::move(t));
      r.pos += ln;
    } else {
      r.skip(wt);
    }
  }
  return r.ok;
}

PyObject* py_scan_initializers(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  const uint8_t* file = (const uint8_t*)view.buf;
  size_t len = (size_t)view.len;

  std::vector<TensorMeta> metas;
  Reader r{file, len};
  bool graphs_ok = true;
  while (r.ok && r.pos < r.len) {
    uint64_t tag = r.varint();
    uint32_t fnum = (uint32_t)(tag >> 3), wt = (uint32_t)(tag & 7);
    if (fnum == 7 && wt == 2) {  // ModelProto.graph
      uint64_t ln = r.ld_len();
      if (!r.ok) break;
      graphs_ok = scan_graph(file, r.pos, ln, &metas) && graphs_ok;
      r.pos += ln;
    } else {
      r.skip(wt);
    }
  }
  // Reject any raw_data record whose payload would extend past the file.
  for (const TensorMeta& t : metas)
    if (t.has_raw && (t.data_off > len || t.data_len > len - t.data_off))
      graphs_ok = false;
  PyBuffer_Release(&view);
  if (!r.ok || !graphs_ok) {
    PyErr_SetString(PyExc_ValueError, "malformed protobuf");
    return nullptr;
  }

  PyObject* list = PyList_New((Py_ssize_t)metas.size());
  if (!list) return nullptr;
  for (size_t i = 0; i < metas.size(); ++i) {
    const TensorMeta& t = metas[i];
    PyObject* dims = PyTuple_New((Py_ssize_t)t.dims.size());
    for (size_t d = 0; d < t.dims.size(); ++d)
      PyTuple_SET_ITEM(dims, d, PyLong_FromLongLong(t.dims[d]));
    PyObject* item = Py_BuildValue(
        "s#iNnn", t.name.data(), (Py_ssize_t)t.name.size(), t.dtype, dims,
        (Py_ssize_t)(t.has_raw ? t.data_off : (size_t)-1),
        (Py_ssize_t)t.data_len);
    PyList_SET_ITEM(list, (Py_ssize_t)i, item);
  }
  return list;
}

// ---------------------------------------------------------------------------

// Pure-C++ WAV decode core (no Python objects — callable off the GIL).
const char* decode_wav_core(const uint8_t* d, size_t n,
                            std::vector<float>* out, uint32_t* out_sr) {
  if (n < 44 || memcmp(d, "RIFF", 4) || memcmp(d + 8, "WAVE", 4))
    return "not a RIFF/WAVE file";

  uint16_t fmt = 0, n_ch = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  size_t pos = 12;
  while (pos + 8 <= n) {
    uint32_t size;
    memcpy(&size, d + pos + 4, 4);
    const uint8_t* body = d + pos + 8;
    size_t avail = n - pos - 8;  // bytes actually present for this chunk body
    if (!memcmp(d + pos, "fmt ", 4) && size >= 16) {
      if (avail < 16) return "truncated fmt chunk";
      memcpy(&fmt, body, 2);
      memcpy(&n_ch, body + 2, 2);
      memcpy(&sr, body + 4, 4);
      memcpy(&bits, body + 14, 2);
      if (fmt == 0xFFFE) {
        // extensible: the REAL format code leads the SubFormat GUID
        if (avail >= 26) memcpy(&fmt, body + 24, 2);
        else fmt = 1;
      }
    } else if (!memcmp(d + pos, "data", 4)) {
      pcm = body;
      pcm_len = size < avail ? size : avail;
    }
    size_t step = (size_t)size + (size & 1);
    if (step >= avail) break;  // declared size runs past the buffer: stop
    pos += 8 + step;
  }
  if (!pcm || !n_ch || !sr) return "missing fmt/data chunk";
  // validate the (fmt, bits) combination UP FRONT — decoding A-law/mu-law/
  // ADPCM as raw PCM returns garbage-with-HTTP-200 where the pure-Python
  // parser raises; the two decoders must agree on what's supported
  bool ok = (fmt == 3 && (bits == 32 || bits == 64)) ||
            (fmt == 1 && (bits == 8 || bits == 16 || bits == 24 ||
                          bits == 32));
  if (!ok) return "unsupported WAV format/bit depth";

  size_t bytes_per = bits / 8;
  if (!bytes_per) return "bad bit depth";
  size_t frames = pcm_len / (bytes_per * n_ch);
  out->resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (uint16_t c = 0; c < n_ch; ++c) {
      const uint8_t* s = pcm + (i * n_ch + c) * bytes_per;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {
        float f;
        memcpy(&f, s, 4);
        v = f;
      } else if (fmt == 3 && bits == 64) {
        double f;
        memcpy(&f, s, 8);
        v = f;
      } else if (bits == 16) {
        int16_t x;
        memcpy(&x, s, 2);
        v = x / 32768.0;
      } else if (bits == 32) {
        int32_t x;
        memcpy(&x, s, 4);
        v = x / 2147483648.0;
      } else if (bits == 24) {
        int32_t x = s[0] | (s[1] << 8) | (s[2] << 16);
        if (x >= (1 << 23)) x -= (1 << 24);
        v = x / 8388608.0;
      } else if (bits == 8) {
        v = ((int)s[0] - 128) / 128.0;
      }
      acc += v;
    }
    (*out)[i] = (float)(acc / n_ch);
  }
  *out_sr = sr;
  return nullptr;
}

PyObject* py_decode_wav(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  std::vector<float> out;
  uint32_t sr = 0;
  const char* err =
      decode_wav_core((const uint8_t*)view.buf, (size_t)view.len, &out, &sr);
  PyBuffer_Release(&view);
  if (err) {
    PyErr_SetString(PyExc_ValueError, err);
    return nullptr;
  }
  PyObject* out_bytes = PyBytes_FromStringAndSize(
      (const char*)out.data(), (Py_ssize_t)(out.size() * 4));
  if (!out_bytes) return nullptr;
  return Py_BuildValue("(Ni)", out_bytes, (int)sr);
}

// Batch data loader: read + decode many WAV files on a C++ thread pool
// with the GIL released (the reference's audio IO is a single-threaded
// WavReader, examples/sensevoice/src/audio.rs — serving wants parallel IO).
PyObject* py_decode_wav_files(PyObject*, PyObject* args) {
  PyObject* paths;
  if (!PyArg_ParseTuple(args, "O", &paths)) return nullptr;
  PyObject* seq = PySequence_Fast(paths, "expected a sequence of paths");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  std::vector<std::string> names((size_t)n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* it = PySequence_Fast_GET_ITEM(seq, i);
    const char* c = PyUnicode_AsUTF8(it);
    if (!c) { Py_DECREF(seq); return nullptr; }
    names[(size_t)i] = c;
  }
  Py_DECREF(seq);

  struct Slot {
    std::vector<float> pcm;
    uint32_t sr = 0;
    std::string err;
  };
  std::vector<Slot> slots((size_t)n);

  Py_BEGIN_ALLOW_THREADS;
  unsigned hw = std::thread::hardware_concurrency();
  size_t n_threads = hw ? hw : 2;
  if (n_threads > (size_t)n) n_threads = (size_t)n;
  if (n_threads > 16) n_threads = 16;
  std::vector<std::thread> pool;
  for (size_t t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (size_t i = t; i < (size_t)n; i += n_threads) {
        Slot& s = slots[i];
        FILE* f = fopen(names[i].c_str(), "rb");
        if (!f) { s.err = "cannot open " + names[i]; continue; }
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> buf(sz > 0 ? (size_t)sz : 0);
        if (sz > 0 && fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
          s.err = "short read " + names[i];
          fclose(f);
          continue;
        }
        fclose(f);
        const char* e = decode_wav_core(buf.data(), buf.size(), &s.pcm, &s.sr);
        if (e) s.err = std::string(e) + ": " + names[i];
      }
    });
  }
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS;

  for (const Slot& s : slots)
    if (!s.err.empty()) {
      PyErr_SetString(PyExc_ValueError, s.err.c_str());
      return nullptr;
    }
  PyObject* list = PyList_New(n);
  if (!list) return nullptr;
  for (Py_ssize_t i = 0; i < n; ++i) {
    const Slot& s = slots[(size_t)i];
    PyObject* b = PyBytes_FromStringAndSize(
        (const char*)s.pcm.data(), (Py_ssize_t)(s.pcm.size() * 4));
    if (!b) { Py_DECREF(list); return nullptr; }
    PyList_SET_ITEM(list, i, Py_BuildValue("(Ni)", b, (int)s.sr));
  }
  return list;
}

// ---------------------------------------------------------------------------
// Fused nearest-resize + space-to-depth pack for the vision pipelines.
//
// One pass u8 HWC [h, w, c] -> u8 [size/B, size/B, B*B*c] with cell slot
// (u*B+v)*c + cc and PIL-style center-of-pixel nearest mapping
// (utils/image.nearest_resize). Replaces a numpy chain (f32 resize +
// transposes + pack, ~8 ms/frame at 640^2 on a 1-core host) with a single
// byte-shuffle (~sub-ms); the packed layout is what the s2d conv domain
// (models/s2d.py, compiler/s2d_stem.py) consumes directly.

PyObject* py_pack_s2d_u8(PyObject*, PyObject* args) {
  Py_buffer view;
  int h, w, c, size, block;
  if (!PyArg_ParseTuple(args, "y*iiiii", &view, &h, &w, &c, &size, &block))
    return nullptr;
  if (h <= 0 || w <= 0 || c <= 0 || size <= 0 || block <= 0 ||
      size % block != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "bad pack_s2d_u8 dims");
    return nullptr;
  }
  if ((long long)h * w * c != (long long)view.len) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "img byte count != h*w*c");
    return nullptr;
  }
  const int G = size / block;
  PyObject* out = PyBytes_FromStringAndSize(
      nullptr, (Py_ssize_t)G * G * block * block * c);
  if (!out) { PyBuffer_Release(&view); return nullptr; }
  uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
  const uint8_t* src = (const uint8_t*)view.buf;

  Py_BEGIN_ALLOW_THREADS;
  // center-of-pixel nearest maps, precomputed once per axis
  std::vector<int> yi((size_t)size), xi((size_t)size);
  for (int i = 0; i < size; ++i) {
    int y = (int)(((double)i + 0.5) * h / size);
    int x = (int)(((double)i + 0.5) * w / size);
    yi[(size_t)i] = y < h ? y : h - 1;
    xi[(size_t)i] = x < w ? x : w - 1;
  }
  uint8_t* o = dst;  // output written strictly sequentially
  for (int gy = 0; gy < G; ++gy)
    for (int gx = 0; gx < G; ++gx)
      for (int u = 0; u < block; ++u) {
        const uint8_t* row = src + (size_t)yi[(size_t)(gy * block + u)] * w * c;
        for (int v = 0; v < block; ++v) {
          const uint8_t* p = row + (size_t)xi[(size_t)(gx * block + v)] * c;
          for (int cc = 0; cc < c; ++cc) *o++ = p[cc];
        }
      }
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&view);
  return out;
}

// ---------------------------------------------------------------------------

PyObject* py_content_hash(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  const uint8_t* d = (const uint8_t*)view.buf;
  uint64_t h = 1469598103934665603ULL;  // FNV-1a 64
  for (Py_ssize_t i = 0; i < view.len; ++i) {
    h ^= d[i];
    h *= 1099511628211ULL;
  }
  PyBuffer_Release(&view);
  return PyLong_FromUnsignedLongLong(h);
}

PyMethodDef methods[] = {
    {"scan_initializers", py_scan_initializers, METH_VARARGS,
     "scan ONNX bytes -> [(name, dtype, dims, raw_offset, nbytes)]"},
    {"decode_wav", py_decode_wav, METH_VARARGS,
     "decode RIFF/WAVE -> (float32 mono bytes, sample_rate)"},
    {"decode_wav_files", py_decode_wav_files, METH_VARARGS,
     "threaded batch decode: [path,...] -> [(float32 bytes, sr), ...]"},
    {"pack_s2d_u8", py_pack_s2d_u8, METH_VARARGS,
     "fused nearest-resize + s2d pack: u8 HWC -> u8 [G, G, B*B*c]"},
    {"content_hash", py_content_hash, METH_VARARGS, "FNV-1a 64 content hash"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_lele_native",
    "native runtime components for lele_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__lele_native(void) { return PyModule_Create(&moduledef); }
