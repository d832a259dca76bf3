// Native checkpoint IO: memory-mapped safetensors reader.
//
// The reference delegates weight loading to HF `from_pretrained`
// (/root/reference/example.py:22-28).  kivi-tpu's load path reads
// safetensors shards directly; this C++ reader provides the IO layer:
// it mmaps a shard once and exposes zero-copy pointers into the tensor
// data, so multi-GB checkpoints stream into device transfers without a
// host-side copy per tensor.  Python binds via ctypes
// (kivi_tpu/models/native_io.py); a pure-Python fallback exists when the
// shared object has not been built.
//
// Build: cc -O2 -shared -fPIC -o libsafetensors_reader.so safetensors_reader.cpp
// (see native/Makefile).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorInfo {
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct Shard {
  int fd = -1;
  uint8_t* base = nullptr;   // mmap base
  size_t size = 0;           // file size
  uint64_t data_off = 0;     // start of the tensor data section
  std::unordered_map<std::string, TensorInfo> tensors;
  std::vector<std::string> names;  // stable iteration order
};

// --- minimal JSON scanner for the safetensors header -----------------------
// The header is a single JSON object: {"name": {"dtype":"F32","shape":[...],
// "data_offsets":[b,e]}, ..., "__metadata__": {...}}.  We only need string
// keys, string values, integer arrays and nested one-level objects, so a
// hand-rolled scanner avoids a JSON dependency.

struct Scanner {
  const char* p;
  const char* end;
  bool fail = false;

  void ws() { while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' || *p == '\r')) ++p; }
  bool eat(char c) {
    ws();
    if (p < end && *p == c) { ++p; return true; }
    return false;
  }
  std::string str() {
    ws();
    std::string out;
    if (p >= end || *p != '"') { fail = true; return out; }
    ++p;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) ++p;  // keep escaped char verbatim
      out.push_back(*p++);
    }
    if (p < end) ++p;
    return out;
  }
  int64_t integer() {
    ws();
    bool neg = (p < end && *p == '-');
    if (neg) ++p;
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p++ - '0'); any = true; }
    if (!any) fail = true;
    return neg ? -v : v;
  }
  // skip any JSON value (for __metadata__ entries)
  void skip_value() {
    ws();
    if (p >= end) { fail = true; return; }
    if (*p == '"') { str(); return; }
    if (*p == '{') {
      ++p;
      ws();
      if (eat('}')) return;
      do { str(); if (!eat(':')) { fail = true; return; } skip_value(); } while (eat(','));
      if (!eat('}')) fail = true;
      return;
    }
    if (*p == '[') {
      ++p;
      ws();
      if (eat(']')) return;
      do { skip_value(); } while (eat(','));
      if (!eat(']')) fail = true;
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
  }
};

bool parse_header(Shard& s) {
  if (s.size < 8) return false;
  uint64_t hlen;
  std::memcpy(&hlen, s.base, 8);  // little-endian header length
  // subtract, don't add: `8 + hlen` wraps for hlen near 2^64, passing
  // the bound and pointing the scanner past the mapping
  if (hlen > s.size - 8) return false;
  s.data_off = 8 + hlen;

  Scanner sc{reinterpret_cast<const char*>(s.base + 8),
             reinterpret_cast<const char*>(s.base + 8 + hlen)};
  if (!sc.eat('{')) return false;
  if (sc.eat('}')) return true;
  do {
    std::string name = sc.str();
    if (!sc.eat(':')) return false;
    if (name == "__metadata__") {
      sc.skip_value();
      continue;
    }
    TensorInfo ti;
    if (!sc.eat('{')) return false;
    do {
      std::string key = sc.str();
      if (!sc.eat(':')) return false;
      if (key == "dtype") {
        ti.dtype = sc.str();
      } else if (key == "shape") {
        if (!sc.eat('[')) return false;
        sc.ws();
        if (!sc.eat(']')) {
          do { ti.shape.push_back(sc.integer()); } while (sc.eat(','));
          if (!sc.eat(']')) return false;
        }
      } else if (key == "data_offsets") {
        if (!sc.eat('[')) return false;
        ti.begin = static_cast<uint64_t>(sc.integer());
        if (!sc.eat(',')) return false;
        ti.end = static_cast<uint64_t>(sc.integer());
        if (!sc.eat(']')) return false;
      } else {
        sc.skip_value();
      }
    } while (sc.eat(','));
    if (!sc.eat('}')) return false;
    if (sc.fail) return false;
    if (ti.begin > ti.end || s.data_off + ti.end > s.size) return false;
    s.names.push_back(name);
    s.tensors.emplace(std::move(name), std::move(ti));
  } while (sc.eat(','));
  return sc.eat('}') && !sc.fail;
}

}  // namespace

extern "C" {

// Opens + mmaps a shard; returns an opaque handle or null on failure.
void* str_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }
  ::madvise(base, st.st_size, MADV_SEQUENTIAL);
  auto* s = new Shard();
  s->fd = fd;
  s->base = static_cast<uint8_t*>(base);
  s->size = st.st_size;
  if (!parse_header(*s)) {
    ::munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  return s;
}

void str_close(void* h) {
  auto* s = static_cast<Shard*>(h);
  if (!s) return;
  ::munmap(s->base, s->size);
  ::close(s->fd);
  delete s;
}

int64_t str_num_tensors(void* h) {
  return static_cast<Shard*>(h)->names.size();
}

// Name of tensor i; returns bytes written (excl. NUL), -1 if buf too small.
int64_t str_tensor_name(void* h, int64_t i, char* buf, int64_t buflen) {
  auto* s = static_cast<Shard*>(h);
  if (i < 0 || i >= static_cast<int64_t>(s->names.size())) return -1;
  const std::string& n = s->names[i];
  if (static_cast<int64_t>(n.size()) + 1 > buflen) return -1;
  std::memcpy(buf, n.c_str(), n.size() + 1);
  return n.size();
}

// Info for `name`: dtype string into dbuf, ndim + dims into dims (max 8),
// data pointer + nbytes.  Returns 0 on success.
int64_t str_tensor_info(void* h, const char* name, char* dbuf,
                        int64_t dbuflen, int64_t* ndim, int64_t* dims,
                        const uint8_t** data, int64_t* nbytes) {
  auto* s = static_cast<Shard*>(h);
  auto it = s->tensors.find(name);
  if (it == s->tensors.end()) return -1;
  const TensorInfo& ti = it->second;
  if (static_cast<int64_t>(ti.dtype.size()) + 1 > dbuflen) return -1;
  std::memcpy(dbuf, ti.dtype.c_str(), ti.dtype.size() + 1);
  if (static_cast<int64_t>(ti.shape.size()) > 8) return -1;
  *ndim = ti.shape.size();
  for (size_t i = 0; i < ti.shape.size(); ++i) dims[i] = ti.shape[i];
  *data = s->base + s->data_off + ti.begin;
  *nbytes = ti.end - ti.begin;
  return 0;
}

}  // extern "C"
