// Native bulk FITS binary-table column loader.
//
// The hot host-side path of a sector-scale search is loading thousands of
// mission light-curve files and packing their TIME/FLUX/FLUX_ERR columns
// into contiguous batch buffers for jax.device_put.  The reference
// delegates per-file parsing to astropy's C tokenizer; here we provide a
// small, dependency-free C++ reader exposed through a C ABI (consumed via
// ctypes in lightkurve_tpu.io.native):
//
//   lk_read_column_f64(path, extname_or_empty, column, out, cap) -> nrows
//   lk_read_batch_f64(paths[], nfiles, column, out, stride, nthreads)
//
// Scope: uncompressed FITS, BINTABLE extensions, scalar numeric columns
// (L, B, I, J, K, E, D).  Returns negative error codes on malformed input.
// Thread-safe: no shared mutable state; the batch loader fans files out
// over a std::thread pool.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <atomic>

namespace {

constexpr size_t kBlock = 2880;
constexpr size_t kCard = 80;

struct Column {
  std::string name;
  char code = 0;     // TFORM type code
  int repeat = 1;
  long offset = 0;   // byte offset within a row
};

struct Table {
  long nrows = 0;
  long rowbytes = 0;
  long data_start = 0;  // byte offset of table data in file
  std::vector<Column> cols;
};

struct FileBuf {
  char* data = nullptr;
  long size = 0;
  FILE* fp = nullptr;
  ~FileBuf() {
    free(data);
    if (fp) fclose(fp);
  }
};

int read_file(const char* path, FileBuf* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  fseek(fp, 0, SEEK_END);
  long size = ftell(fp);
  fseek(fp, 0, SEEK_SET);
  char* buf = static_cast<char*>(malloc(size));
  if (!buf) {
    fclose(fp);
    return -2;
  }
  if (fread(buf, 1, size, fp) != static_cast<size_t>(size)) {
    free(buf);
    fclose(fp);
    return -3;
  }
  fclose(fp);
  out->data = buf;
  out->size = size;
  return 0;
}

std::string card_keyword(const char* card) {
  std::string kw(card, 8);
  size_t end = kw.find_last_not_of(' ');
  return end == std::string::npos ? "" : kw.substr(0, end + 1);
}

std::string card_value(const char* card) {
  // value between "= " and optional " /comment"
  if (card[8] != '=') return "";
  std::string body(card + 10, kCard - 10);
  bool in_str = false;
  size_t slash = std::string::npos;
  for (size_t i = 0; i < body.size(); i++) {
    char c = body[i];
    if (c == '\'') in_str = !in_str;
    else if (c == '/' && !in_str) {
      slash = i;
      break;
    }
  }
  std::string val = body.substr(0, slash);
  // strip blanks and quotes
  size_t a = val.find_first_not_of(' ');
  if (a == std::string::npos) return "";
  size_t b = val.find_last_not_of(' ');
  val = val.substr(a, b - a + 1);
  if (!val.empty() && val.front() == '\'') {
    val = val.substr(1, val.rfind('\'') - 1);
    size_t e = val.find_last_not_of(' ');
    val = e == std::string::npos ? "" : val.substr(0, e + 1);
  }
  return val;
}

int type_size(char code) {
  switch (code) {
    case 'L': case 'B': case 'X': case 'A': return 1;
    case 'I': return 2;
    case 'J': case 'E': return 4;
    case 'K': case 'D': return 8;
    case 'C': return 8;
    case 'M': return 16;
    default: return -1;
  }
}

// Parse one header starting at *offset; advances *offset past the header.
// Fills key/value pairs needed for table parsing.
struct HeaderInfo {
  std::string xtension, extname;
  long naxis1 = 0, naxis2 = 0, pcount = 0;
  int tfields = 0, bitpix = 8, naxis = 0;
  std::vector<long> naxes;
  std::vector<std::string> ttypes, tforms;
};

int parse_header(const FileBuf& f, long* offset, HeaderInfo* h) {
  bool end = false;
  h->ttypes.resize(1000);
  h->tforms.resize(1000);
  while (!end) {
    if (*offset + static_cast<long>(kBlock) > f.size) return -4;
    const char* block = f.data + *offset;
    *offset += kBlock;
    for (size_t i = 0; i < kBlock; i += kCard) {
      const char* card = block + i;
      std::string kw = card_keyword(card);
      if (kw == "END") {
        end = true;
        break;
      }
      if (kw == "XTENSION") h->xtension = card_value(card);
      else if (kw == "EXTNAME") h->extname = card_value(card);
      else if (kw == "BITPIX") h->bitpix = atoi(card_value(card).c_str());
      else if (kw == "NAXIS") h->naxis = atoi(card_value(card).c_str());
      else if (kw == "NAXIS1") h->naxis1 = atol(card_value(card).c_str());
      else if (kw == "NAXIS2") h->naxis2 = atol(card_value(card).c_str());
      else if (kw == "PCOUNT") h->pcount = atol(card_value(card).c_str());
      else if (kw == "TFIELDS") h->tfields = atoi(card_value(card).c_str());
      else if (kw.rfind("TTYPE", 0) == 0) {
        int idx = atoi(kw.c_str() + 5);
        if (idx >= 1 && idx < 1000) h->ttypes[idx] = card_value(card);
      } else if (kw.rfind("TFORM", 0) == 0) {
        int idx = atoi(kw.c_str() + 5);
        if (idx >= 1 && idx < 1000) h->tforms[idx] = card_value(card);
      } else if (kw.rfind("NAXIS", 0) == 0 && kw.size() > 5) {
        h->naxes.push_back(atol(card_value(card).c_str()));
      }
    }
  }
  return 0;
}

long image_data_bytes(const HeaderInfo& h) {
  if (h.naxis == 0) return 0;
  long count = 1;
  if (h.naxis1 > 0) count *= h.naxis1;
  if (h.naxis >= 2 && h.naxis2 > 0) count *= h.naxis2;
  for (long n : h.naxes) count *= n;  // NAXIS3+ collected separately
  return count * (abs(h.bitpix) / 8);
}

// Locate a BINTABLE (optionally by EXTNAME) and parse its columns.
int find_table(const FileBuf& f, const char* extname, Table* t) {
  long offset = 0;
  bool first = true;
  while (offset < f.size) {
    if (memcmp(f.data + offset, "\0\0\0\0", 4) == 0) break;  // padding
    HeaderInfo h;
    int rc = parse_header(f, &offset, &h);
    if (rc != 0) return rc;
    long databytes;
    if (first || h.xtension != "BINTABLE") {
      // primary HDU or image extension: skip its data
      long count = 1;
      bool any = h.naxis > 0;
      if (h.naxis >= 1) count *= (h.naxis1 > 0 ? h.naxis1 : 1);
      if (h.naxis >= 2) count *= (h.naxis2 > 0 ? h.naxis2 : 1);
      for (long n : h.naxes) count *= (n > 0 ? n : 1);
      databytes = any ? count * (abs(h.bitpix) / 8) : 0;
      offset += ((databytes + kBlock - 1) / kBlock) * kBlock;
      first = false;
      continue;
    }
    first = false;
    databytes = h.naxis1 * h.naxis2 + h.pcount;
    bool name_ok = (extname == nullptr || extname[0] == '\0' ||
                    h.extname == extname);
    if (!name_ok) {
      offset += ((databytes + kBlock - 1) / kBlock) * kBlock;
      continue;
    }
    t->nrows = h.naxis2;
    t->rowbytes = h.naxis1;
    t->data_start = offset;
    long col_off = 0;
    for (int i = 1; i <= h.tfields; i++) {
      Column c;
      c.name = h.ttypes[i];
      const std::string& tf = h.tforms[i];
      size_t p = 0;
      while (p < tf.size() && isdigit(tf[p])) p++;
      c.repeat = (p > 0) ? atoi(tf.substr(0, p).c_str()) : 1;
      c.code = p < tf.size() ? tf[p] : 0;
      c.offset = col_off;
      int sz = type_size(c.code);
      if (sz < 0) return -5;
      if (c.code == 'X')
        col_off += (c.repeat + 7) / 8;
      else
        col_off += static_cast<long>(c.repeat) * sz;
      t->cols.push_back(c);
    }
    if (col_off > t->rowbytes) return -6;
    return 0;
  }
  return -7;  // no matching table
}

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

// Extract the FIRST element of a (possibly vector) column as f64.
int extract_column(const FileBuf& f, const Table& t, const Column& c,
                   double* out, long cap) {
  long n = t.nrows < cap ? t.nrows : cap;
  const char* base = f.data + t.data_start + c.offset;
  long stride = t.rowbytes;
  if (t.data_start + (t.nrows - 1) * stride + c.offset + 8 > f.size + 8)
    return -8;
  for (long i = 0; i < n; i++) {
    const char* p = base + i * stride;
    switch (c.code) {
      case 'D': {
        uint64_t v;
        memcpy(&v, p, 8);
        v = bswap64(v);
        double d;
        memcpy(&d, &v, 8);
        out[i] = d;
        break;
      }
      case 'E': {
        uint32_t v;
        memcpy(&v, p, 4);
        v = bswap32(v);
        float fl;
        memcpy(&fl, &v, 4);
        out[i] = fl;
        break;
      }
      case 'J': {
        uint32_t v;
        memcpy(&v, p, 4);
        out[i] = static_cast<int32_t>(bswap32(v));
        break;
      }
      case 'I': {
        uint16_t v;
        memcpy(&v, p, 2);
        out[i] = static_cast<int16_t>(bswap16(v));
        break;
      }
      case 'K': {
        uint64_t v;
        memcpy(&v, p, 8);
        out[i] = static_cast<double>(static_cast<int64_t>(bswap64(v)));
        break;
      }
      case 'B':
        out[i] = static_cast<unsigned char>(*p);
        break;
      case 'L':
        out[i] = (*p == 'T') ? 1.0 : 0.0;
        break;
      default:
        return -9;
    }
  }
  return static_cast<int>(n);
}

int read_column_impl(const char* path, const char* extname,
                     const char* column, double* out, long cap) {
  FileBuf f;
  int rc = read_file(path, &f);
  if (rc != 0) return rc;
  if (f.size < 6 || memcmp(f.data, "SIMPLE", 6) != 0) return -10;
  Table t;
  rc = find_table(f, extname, &t);
  if (rc != 0) return rc;
  for (const Column& c : t.cols) {
    if (strcasecmp(c.name.c_str(), column) == 0)
      return extract_column(f, t, c, out, cap);
  }
  return -11;  // column not found
}

}  // namespace

extern "C" {

// Returns nrows read (>=0) or a negative error code.
int lk_read_column_f64(const char* path, const char* extname,
                       const char* column, double* out, long cap) {
  return read_column_impl(path, extname, column, out, cap);
}

// Parallel batch load: out is (nfiles, stride) row-major f64; short files
// are NaN-padded. nrows_out[i] receives each file's row count (or <0).
void lk_read_batch_f64(const char** paths, int nfiles, const char* column,
                       double* out, long stride, int* nrows_out,
                       int nthreads) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= nfiles) return;
      double* dst = out + static_cast<long>(i) * stride;
      for (long j = 0; j < stride; j++) dst[j] = __builtin_nan("");
      nrows_out[i] = lk_read_column_f64(paths[i], "", column, dst, stride);
    }
  };
  std::vector<std::thread> pool;
  for (int k = 0; k < nthreads; k++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Count rows of the first BINTABLE (for sizing buffers).
long lk_table_rows(const char* path, const char* extname) {
  FileBuf f;
  if (read_file(path, &f) != 0) return -1;
  Table t;
  if (find_table(f, extname, &t) != 0) return -2;
  return t.nrows;
}

}  // extern "C"
