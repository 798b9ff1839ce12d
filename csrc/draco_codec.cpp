// Draco mesh codec (sequential encoding), from scratch in C++.
//
// The reference vendors Google's Draco decoder as an Emscripten WASM blob
// (reference: public/static/draco/, wired at src/main.ts:258-260) to decode
// KHR_draco_mesh_compression glTF primitives.  This is our native
// equivalent: a bitstream-level implementation of the Draco 2.2 format's
// MESH_SEQUENTIAL_ENCODING method — both directions, so compressed GLBs we
// export round-trip through our own importer and any spec-conformant
// sequential-encoded asset decodes.
//
// Supported bitstream subset (gated with clear errors otherwise):
//   * encoder_type   TRIANGULAR_MESH (1)
//   * encoder_method MESH_SEQUENTIAL_ENCODING (0); edgebreaker (1) -> error
//   * connectivity   uncompressed indices (u8/u16/varUI32/u32 by point count)
//   * attributes     SEQUENTIAL_GENERIC (raw float32) and
//                    SEQUENTIAL_QUANTIZATION / SEQUENTIAL_INTEGER with
//                    PREDICTION_NONE + uncompressed (non-rANS) values
//   * no metadata chunk
//
// C ABI only; bound from Python via ctypes (tpu_pathtracer/io/draco.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <exception>
#include <string>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string &msg) { g_error = msg; }

// ---------------------------------------------------------------------------
// bitstream reader (bounds checked)
// ---------------------------------------------------------------------------

struct Reader {
  const uint8_t *buf;
  int64_t len;
  int64_t pos = 0;
  bool ok = true;

  bool need(int64_t n) {
    if (!ok || pos + n > len) {
      ok = false;
      set_error("draco: truncated stream at byte " + std::to_string(pos));
      return false;
    }
    return true;
  }
  uint8_t u8() {
    if (!need(1)) return 0;
    return buf[pos++];
  }
  uint16_t u16() {
    if (!need(2)) return 0;
    uint16_t v = (uint16_t)(buf[pos] | (buf[pos + 1] << 8));
    pos += 2;
    return v;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v;
    std::memcpy(&v, buf + pos, 4);
    pos += 4;
    return v;
  }
  float f32() {
    uint32_t v = u32();
    float f;
    std::memcpy(&f, &v, 4);
    return f;
  }
  uint32_t varu32() {
    uint32_t v = 0;
    int shift = 0;
    for (int i = 0; i < 5; ++i) {
      uint8_t b = u8();
      if (!ok) return 0;
      v |= (uint32_t)(b & 0x7f) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    set_error("draco: varint longer than 5 bytes");
    return 0;
  }
};

struct Writer {
  std::vector<uint8_t> out;
  void u8(uint8_t v) { out.push_back(v); }
  void u16(uint16_t v) {
    out.push_back((uint8_t)(v & 0xff));
    out.push_back((uint8_t)(v >> 8));
  }
  void u32(uint32_t v) {
    for (int i = 0; i < 4; ++i) out.push_back((uint8_t)((v >> (8 * i)) & 0xff));
  }
  void f32(float f) {
    uint32_t v;
    std::memcpy(&v, &f, 4);
    u32(v);
  }
  void varu32(uint32_t v) {
    while (v >= 0x80) {
      out.push_back((uint8_t)(v | 0x80));
      v >>= 7;
    }
    out.push_back((uint8_t)v);
  }
};

// ---------------------------------------------------------------------------
// decoded representation
// ---------------------------------------------------------------------------

struct Attribute {
  uint32_t unique_id = 0;
  uint8_t att_type = 0;    // 0 POSITION, 1 NORMAL, 2 COLOR, 3 TEX_COORD, 4 GENERIC
  uint8_t data_type = 9;   // DT_FLOAT32
  uint8_t components = 3;
  uint8_t normalized = 0;
  std::vector<float> values;  // num_points * components, dequantized
};

struct DecodedMesh {
  uint32_t num_points = 0;
  uint32_t num_faces = 0;
  std::vector<uint32_t> indices;  // 3 * num_faces
  std::vector<Attribute> attrs;
};

constexpr uint8_t DT_FLOAT32 = 9;
constexpr uint8_t SEQ_GENERIC = 0;
constexpr uint8_t SEQ_INTEGER = 1;
constexpr uint8_t SEQ_QUANTIZATION = 2;
constexpr int8_t PREDICTION_NONE = -2;

int32_t unzigzag(uint32_t u) {
  return (int32_t)((u >> 1) ^ (~(u & 1) + 1));
}
uint32_t zigzag(int32_t v) { return ((uint32_t)v << 1) ^ (uint32_t)(v >> 31); }

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

bool decode_stream(const uint8_t *buf, int64_t len, DecodedMesh &mesh) {
  Reader r{buf, len};
  if (!r.need(8)) return false;
  if (std::memcmp(buf, "DRACO", 5) != 0) {
    set_error("draco: bad magic (not a Draco stream)");
    return false;
  }
  r.pos = 5;
  uint8_t major = r.u8(), minor = r.u8();
  if (major != 2) {
    set_error("draco: unsupported bitstream major version " +
              std::to_string(major) + "." + std::to_string(minor));
    return false;
  }
  uint8_t enc_type = r.u8();
  uint8_t method = r.u8();
  uint16_t flags = r.u16();
  if (enc_type != 1) {
    set_error("draco: only TRIANGULAR_MESH streams supported (got type " +
              std::to_string(enc_type) + ")");
    return false;
  }
  if (method != 0) {
    set_error(
        "draco: MESH_EDGEBREAKER_ENCODING not supported (only the "
        "sequential method); re-export with sequential/uncompressed "
        "encoding or decode offline");
    return false;
  }
  if (flags & 0x8000) {
    set_error("draco: metadata chunk not supported");
    return false;
  }

  // --- sequential connectivity -------------------------------------------
  mesh.num_faces = r.varu32();
  mesh.num_points = r.varu32();
  if (!r.ok) return false;
  if ((int64_t)mesh.num_faces * 3 > len * 8) {  // sanity vs stream size
    set_error("draco: face count implausible for stream size");
    return false;
  }
  uint8_t conn_method = r.u8();
  if (conn_method != 1) {
    set_error("draco: compressed (rANS) connectivity not supported");
    return false;
  }
  uint64_t n_idx = (uint64_t)mesh.num_faces * 3;
  mesh.indices.resize(n_idx);
  if (mesh.num_points < (1u << 8)) {
    for (uint64_t i = 0; i < n_idx; ++i) mesh.indices[i] = r.u8();
  } else if (mesh.num_points < (1u << 16)) {
    for (uint64_t i = 0; i < n_idx; ++i) mesh.indices[i] = r.u16();
  } else if (mesh.num_points < (1u << 21)) {
    for (uint64_t i = 0; i < n_idx; ++i) mesh.indices[i] = r.varu32();
  } else {
    for (uint64_t i = 0; i < n_idx; ++i) mesh.indices[i] = r.u32();
  }
  if (!r.ok) return false;
  for (uint64_t i = 0; i < n_idx; ++i)
    if (mesh.indices[i] >= mesh.num_points) {
      set_error("draco: vertex index out of range");
      return false;
    }

  // --- attributes ---------------------------------------------------------
  // Plausibility: every point must carry at least one byte of attribute
  // data somewhere in the stream, so num_points bounded by the remaining
  // bytes (mirrors the num_faces check above).  Without this a ~40-byte
  // crafted stream claiming 2^32-2 points forces a multi-GB zero-fill
  // before any per-value bounds check runs (advisor finding, round 1).
  if ((int64_t)mesh.num_points > len) {
    set_error("draco: point count implausible for stream size");
    return false;
  }
  uint8_t n_decoders = r.u8();
  if (!r.ok) return false;
  for (uint8_t d = 0; d < n_decoders; ++d) {
    uint32_t n_attrs = r.varu32();
    if (!r.ok) return false;
    if (n_attrs > 64) {
      set_error("draco: implausible attribute count");
      return false;
    }
    size_t first = mesh.attrs.size();
    for (uint32_t j = 0; j < n_attrs; ++j) {
      Attribute a;
      a.att_type = r.u8();
      a.data_type = r.u8();
      a.components = r.u8();
      a.normalized = r.u8();
      a.unique_id = r.varu32();
      if (!r.ok) return false;
      if (a.components == 0 || a.components > 4) {
        set_error("draco: unsupported component count " +
                  std::to_string(a.components));
        return false;
      }
      mesh.attrs.push_back(a);
    }
    std::vector<uint8_t> dec_types(n_attrs);
    for (uint32_t j = 0; j < n_attrs; ++j) dec_types[j] = r.u8();
    if (!r.ok) return false;

    // per-attribute portable data
    struct QInfo {
      bool quantized = false;
      std::vector<uint32_t> symbols;
    };
    std::vector<QInfo> qinfo(n_attrs);
    for (uint32_t j = 0; j < n_attrs; ++j) {
      Attribute &a = mesh.attrs[first + j];
      uint64_t n_vals = (uint64_t)mesh.num_points * a.components;
      uint8_t dt = dec_types[j];
      if (dt == SEQ_GENERIC) {
        if (a.data_type != DT_FLOAT32) {
          set_error("draco: generic attribute with non-float32 data type " +
                    std::to_string(a.data_type) + " not supported");
          return false;
        }
        if (!r.need((int64_t)n_vals * 4)) return false;  // bounds BEFORE alloc
        a.values.resize(n_vals);
        std::memcpy(a.values.data(), r.buf + r.pos, n_vals * 4);
        r.pos += (int64_t)n_vals * 4;
      } else if (dt == SEQ_INTEGER || dt == SEQ_QUANTIZATION) {
        int8_t pred = (int8_t)r.u8();
        if (!r.ok) return false;
        if (pred != PREDICTION_NONE) {
          set_error("draco: prediction scheme " + std::to_string(pred) +
                    " not supported (only PREDICTION_NONE)");
          return false;
        }
        uint8_t compressed = r.u8();
        if (!r.ok) return false;
        if (compressed) {
          set_error("draco: rANS-compressed attribute values not supported");
          return false;
        }
        uint8_t nbytes = r.u8();
        if (!r.ok) return false;
        if (nbytes != 1 && nbytes != 2 && nbytes != 4) {
          set_error("draco: unsupported integer width " +
                    std::to_string(nbytes));
          return false;
        }
        // every value occupies exactly `nbytes` in the stream: bound the
        // allocation by the remaining bytes before sizing the buffer
        if (!r.need((int64_t)n_vals * nbytes)) return false;
        qinfo[j].quantized = (dt == SEQ_QUANTIZATION);
        qinfo[j].symbols.resize(n_vals);
        for (uint64_t k = 0; k < n_vals; ++k) {
          uint32_t raw = nbytes == 1 ? r.u8() : nbytes == 2 ? r.u16() : r.u32();
          // PREDICTION_NONE stores zigzagged signed symbols
          qinfo[j].symbols[k] = (uint32_t)unzigzag(raw);
        }
        if (!r.ok) return false;
        if (dt == SEQ_INTEGER) {
          a.values.resize(n_vals);
          for (uint64_t k = 0; k < n_vals; ++k)
            a.values[k] = (float)(int32_t)qinfo[j].symbols[k];
        }
      } else {
        set_error("draco: sequential attribute decoder type " +
                  std::to_string(dt) + " not supported");
        return false;
      }
    }
    // transform data (after portable values, per spec ordering)
    for (uint32_t j = 0; j < n_attrs; ++j) {
      if (dec_types[j] != SEQ_QUANTIZATION) continue;
      Attribute &a = mesh.attrs[first + j];
      std::vector<float> mins(a.components);
      for (uint32_t c = 0; c < a.components; ++c) mins[c] = r.f32();
      float range = r.f32();
      uint8_t qbits = r.u8();
      if (!r.ok) return false;
      if (qbits == 0 || qbits > 30) {
        set_error("draco: bad quantization bit count " + std::to_string(qbits));
        return false;
      }
      double scale = (double)range / (double)((1u << qbits) - 1);
      uint64_t n_vals = (uint64_t)mesh.num_points * a.components;
      a.values.resize(n_vals);
      for (uint64_t k = 0; k < n_vals; ++k) {
        uint32_t c = (uint32_t)(k % a.components);
        a.values[k] =
            (float)(mins[c] + (double)(int32_t)qinfo[j].symbols[k] * scale);
      }
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// encoder
// ---------------------------------------------------------------------------

void encode_attr_header(Writer &w, uint8_t att_type, uint8_t components,
                        uint32_t unique_id) {
  w.u8(att_type);
  w.u8(DT_FLOAT32);
  w.u8(components);
  w.u8(0);  // normalized
  w.varu32(unique_id);
}

void encode_attr_values(Writer &w, const float *vals, uint64_t n_points,
                        uint32_t components, int qbits) {
  uint64_t n_vals = n_points * components;
  if (qbits <= 0) {  // generic raw float32
    size_t off = w.out.size();
    w.out.resize(off + n_vals * 4);
    std::memcpy(w.out.data() + off, vals, n_vals * 4);
    return;
  }
  // quantization: portable integer part first, transform data after
  std::vector<float> mins(components, INFINITY);
  std::vector<float> maxs(components, -INFINITY);
  for (uint64_t k = 0; k < n_vals; ++k) {
    uint32_t c = (uint32_t)(k % components);
    mins[c] = std::min(mins[c], vals[k]);
    maxs[c] = std::max(maxs[c], vals[k]);
  }
  float range = 0.f;
  for (uint32_t c = 0; c < components; ++c)
    range = std::max(range, maxs[c] - mins[c]);
  if (!(range > 0.f)) range = 1.f;
  uint32_t maxq = (1u << qbits) - 1;
  double inv_scale = (double)maxq / (double)range;

  w.u8((uint8_t)PREDICTION_NONE);
  w.u8(0);  // not compressed
  uint8_t nbytes = qbits <= 7 ? 1 : qbits <= 15 ? 2 : 4;
  w.u8(nbytes);
  for (uint64_t k = 0; k < n_vals; ++k) {
    uint32_t c = (uint32_t)(k % components);
    double q = ((double)vals[k] - (double)mins[c]) * inv_scale;
    int32_t qi = (int32_t)std::lround(q);
    if (qi < 0) qi = 0;
    if ((uint32_t)qi > maxq) qi = (int32_t)maxq;
    uint32_t zz = zigzag(qi);
    if (nbytes == 1)
      w.u8((uint8_t)zz);
    else if (nbytes == 2)
      w.u16((uint16_t)zz);
    else
      w.u32(zz);
  }
  // transform data
  for (uint32_t c = 0; c < components; ++c) w.f32(mins[c]);
  w.f32(range);
  w.u8((uint8_t)qbits);
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
//
// Every entry point is wrapped so C++ exceptions (std::bad_alloc above all)
// never cross the ctypes boundary — an escaping exception through extern "C"
// calls std::terminate and takes the Python interpreter down with it
// (advisor finding, round 1).
// ---------------------------------------------------------------------------

namespace {

template <typename Fn>
int64_t guarded(Fn &&fn) noexcept {
  try {
    return fn();
  } catch (const std::exception &e) {
    set_error(std::string("draco: internal error: ") + e.what());
    return -1;
  } catch (...) {
    set_error("draco: unknown internal error");
    return -1;
  }
}

}  // namespace

extern "C" {

const char *tpu_pt_draco_last_error() { return g_error.c_str(); }

// --- decode-to-handle API: one full parse, then cheap accessor reads ------

// Returns an opaque handle (free with tpu_pt_draco_close) or NULL on error.
void *tpu_pt_draco_open(const uint8_t *buf, int64_t len) {
  void *out = nullptr;
  guarded([&]() -> int64_t {
    auto m = new DecodedMesh();
    if (!decode_stream(buf, len, *m)) {
      delete m;
      return -1;
    }
    out = m;
    return 0;
  });
  return out;
}

void tpu_pt_draco_close(void *h) {
  delete static_cast<DecodedMesh *>(h);
}

// info[0]=num_points, info[1]=num_faces, info[2]=num_attributes
int64_t tpu_pt_draco_h_info(void *h, int64_t *info) {
  return guarded([&]() -> int64_t {
    const auto &m = *static_cast<DecodedMesh *>(h);
    info[0] = m.num_points;
    info[1] = m.num_faces;
    info[2] = (int64_t)m.attrs.size();
    return 0;
  });
}

// out[0]=unique_id, out[1]=att_type, out[2]=data_type, out[3]=components
int64_t tpu_pt_draco_h_attr_info(void *h, int64_t j, int64_t *out) {
  return guarded([&]() -> int64_t {
    const auto &m = *static_cast<DecodedMesh *>(h);
    if (j < 0 || j >= (int64_t)m.attrs.size()) {
      set_error("draco: attribute index out of range");
      return -1;
    }
    out[0] = m.attrs[j].unique_id;
    out[1] = m.attrs[j].att_type;
    out[2] = m.attrs[j].data_type;
    out[3] = m.attrs[j].components;
    return 0;
  });
}

// out must hold 3*num_faces uint32
int64_t tpu_pt_draco_h_indices(void *h, uint32_t *out) {
  return guarded([&]() -> int64_t {
    const auto &m = *static_cast<DecodedMesh *>(h);
    std::memcpy(out, m.indices.data(), m.indices.size() * 4);
    return (int64_t)m.indices.size();
  });
}

// out must hold num_points*components float32 for attribute j
int64_t tpu_pt_draco_h_attr_f32(void *h, int64_t j, float *out) {
  return guarded([&]() -> int64_t {
    const auto &m = *static_cast<DecodedMesh *>(h);
    if (j < 0 || j >= (int64_t)m.attrs.size()) {
      set_error("draco: attribute index out of range");
      return -1;
    }
    const Attribute &a = m.attrs[j];
    std::memcpy(out, a.values.data(), a.values.size() * 4);
    return (int64_t)a.values.size();
  });
}

// --- legacy one-shot API (kept for compatibility; each call re-parses) ----

// info[0]=num_points, info[1]=num_faces, info[2]=num_attributes
int64_t tpu_pt_draco_info(const uint8_t *buf, int64_t len, int64_t *info) {
  return guarded([&]() -> int64_t {
    DecodedMesh m;
    if (!decode_stream(buf, len, m)) return -1;
    info[0] = m.num_points;
    info[1] = m.num_faces;
    info[2] = (int64_t)m.attrs.size();
    return 0;
  });
}

// out[0]=unique_id, out[1]=att_type, out[2]=data_type, out[3]=components
int64_t tpu_pt_draco_attr_info(const uint8_t *buf, int64_t len, int64_t j,
                               int64_t *out) {
  return guarded([&]() -> int64_t {
    DecodedMesh m;
    if (!decode_stream(buf, len, m)) return -1;
    if (j < 0 || j >= (int64_t)m.attrs.size()) {
      set_error("draco: attribute index out of range");
      return -1;
    }
    out[0] = m.attrs[j].unique_id;
    out[1] = m.attrs[j].att_type;
    out[2] = m.attrs[j].data_type;
    out[3] = m.attrs[j].components;
    return 0;
  });
}

// out must hold 3*num_faces uint32
int64_t tpu_pt_draco_indices(const uint8_t *buf, int64_t len, uint32_t *out) {
  return guarded([&]() -> int64_t {
    DecodedMesh m;
    if (!decode_stream(buf, len, m)) return -1;
    std::memcpy(out, m.indices.data(), m.indices.size() * 4);
    return (int64_t)m.indices.size();
  });
}

// out must hold num_points*components float32 for attribute j
int64_t tpu_pt_draco_attr_f32(const uint8_t *buf, int64_t len, int64_t j,
                              float *out) {
  return guarded([&]() -> int64_t {
    DecodedMesh m;
    if (!decode_stream(buf, len, m)) return -1;
    if (j < 0 || j >= (int64_t)m.attrs.size()) {
      set_error("draco: attribute index out of range");
      return -1;
    }
    const Attribute &a = m.attrs[j];
    std::memcpy(out, a.values.data(), a.values.size() * 4);
    return (int64_t)a.values.size();
  });
}

// Encode pos (n,3) [+ optional nrm (n,3)] with faces idx (f,3).
// qpos/qnrm: quantization bits, 0 = raw float32.  Returns byte size written
// to out (capacity cap), or -1 (error) / required size if cap too small.
int64_t tpu_pt_draco_encode(const float *pos, const float *nrm, int64_t n,
                            const uint32_t *idx, int64_t f, int64_t qpos,
                            int64_t qnrm, uint8_t *out, int64_t cap) {
  return guarded([&]() -> int64_t {
  if (n <= 0 || f <= 0 || n > 0x7fffffff || f > 0x7fffffff) {
    set_error("draco: bad point/face count");
    return -1;
  }
  if (qpos > 30 || qnrm > 30) {
    set_error("draco: quantization bits must be <= 30");
    return -1;
  }
  for (int64_t i = 0; i < 3 * f; ++i)
    if (idx[i] >= (uint64_t)n) {
      set_error("draco: face index out of range");
      return -1;
    }
  Writer w;
  const char magic[5] = {'D', 'R', 'A', 'C', 'O'};
  for (char c : magic) w.u8((uint8_t)c);
  w.u8(2);   // major
  w.u8(2);   // minor
  w.u8(1);   // TRIANGULAR_MESH
  w.u8(0);   // MESH_SEQUENTIAL_ENCODING
  w.u16(0);  // flags

  w.varu32((uint32_t)f);
  w.varu32((uint32_t)n);
  w.u8(1);  // uncompressed connectivity
  if (n < (1 << 8)) {
    for (int64_t i = 0; i < 3 * f; ++i) w.u8((uint8_t)idx[i]);
  } else if (n < (1 << 16)) {
    for (int64_t i = 0; i < 3 * f; ++i) w.u16((uint16_t)idx[i]);
  } else if (n < (1 << 21)) {
    for (int64_t i = 0; i < 3 * f; ++i) w.varu32(idx[i]);
  } else {
    for (int64_t i = 0; i < 3 * f; ++i) w.u32(idx[i]);
  }

  uint8_t n_attrs = nrm ? 2 : 1;
  w.u8(1);  // one attributes decoder
  w.varu32(n_attrs);
  encode_attr_header(w, 0 /*POSITION*/, 3, 0);
  if (nrm) encode_attr_header(w, 1 /*NORMAL*/, 3, 1);
  w.u8(qpos > 0 ? SEQ_QUANTIZATION : SEQ_GENERIC);
  if (nrm) w.u8(qnrm > 0 ? SEQ_QUANTIZATION : SEQ_GENERIC);
  // portable values for all attributes, then transform data; our encoder
  // emits quantization transform data inline per attribute in spec order
  // (portable block j, ..., then transform block j, ...), matching the
  // decoder above: emit portable parts first.
  {
    // Split portable and transform parts to honor the ordering.
    Writer portable, xform;
    // positions
    if (qpos > 0) {
      Writer tmp;
      encode_attr_values(tmp, pos, (uint64_t)n, 3, (int)qpos);
      // last 3*4 + 4 + 1 bytes are transform data
      size_t xlen = 3 * 4 + 4 + 1;
      portable.out.insert(portable.out.end(), tmp.out.begin(),
                          tmp.out.end() - xlen);
      xform.out.insert(xform.out.end(), tmp.out.end() - xlen, tmp.out.end());
    } else {
      encode_attr_values(portable, pos, (uint64_t)n, 3, 0);
    }
    if (nrm) {
      if (qnrm > 0) {
        Writer tmp;
        encode_attr_values(tmp, nrm, (uint64_t)n, 3, (int)qnrm);
        size_t xlen = 3 * 4 + 4 + 1;
        portable.out.insert(portable.out.end(), tmp.out.begin(),
                            tmp.out.end() - xlen);
        xform.out.insert(xform.out.end(), tmp.out.end() - xlen, tmp.out.end());
      } else {
        encode_attr_values(portable, nrm, (uint64_t)n, 3, 0);
      }
    }
    w.out.insert(w.out.end(), portable.out.begin(), portable.out.end());
    w.out.insert(w.out.end(), xform.out.begin(), xform.out.end());
  }

  int64_t size = (int64_t)w.out.size();
  if (size > cap) return size;  // caller retries with a bigger buffer
  std::memcpy(out, w.out.data(), (size_t)size);
  return size;
  });
}

}  // extern "C"
