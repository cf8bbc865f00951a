// Fast single-pass GFA tokenizer producing the flat arena pools.
//
// Native-code counterpart of pollen_tpu/flatgfa.py::parse_gfa (reference
// analogue: the Rust flatgfa parser, flatgfa/src/{gfaline,parse}.rs).
// The output arrays are bit-identical to the NumPy parser's pools; any
// input this scanner cannot handle returns a nonzero code and the
// caller falls back to the NumPy path (which produces real errors).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpollen_scan.so gfa_scan.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct Span32 {
  uint32_t lo, hi;
};

struct SegRec {
  int64_t name;
  const uint8_t *seq_lo, *seq_hi;
  const uint8_t *opt_lo, *opt_hi;
};

struct LinkRec {
  int64_t from_name, to_name;
  uint8_t from_rev, to_rev;
  const uint8_t *cig_lo, *cig_hi;
};

struct PathRec {
  const uint8_t *name_lo, *name_hi;
  const uint8_t *steps_lo, *steps_hi;
  const uint8_t *olap_lo, *olap_hi;
};

// Parse a decimal integer in [p, end); returns false on empty/garbage.
inline bool parse_u64(const uint8_t *p, const uint8_t *end, int64_t *out) {
  if (p >= end) return false;
  int64_t v = 0;
  for (; p < end; ++p) {
    if (*p < '0' || *p > '9') return false;
    v = v * 10 + (*p - '0');
  }
  *out = v;
  return true;
}

inline const uint8_t *find_tab(const uint8_t *p, const uint8_t *end) {
  return static_cast<const uint8_t *>(
      memchr(p, '\t', static_cast<size_t>(end - p)));
}

inline int op_code(uint8_t c) {
  switch (c) {
    case 'M': return 0;
    case 'N': return 1;
    case 'D': return 2;
    case 'I': return 3;
    default: return -1;
  }
}

// Parse one CIGAR string, appending packed (count << 8 | op) words.
// "*" appends nothing. Returns false on malformed input.
bool parse_cigar(const uint8_t *lo, const uint8_t *hi,
                 std::vector<uint32_t> *pool) {
  if (hi - lo == 1 && *lo == '*') return true;
  const uint8_t *p = lo;
  while (p < hi) {
    int64_t count = 0;
    bool digits = false;
    while (p < hi && *p >= '0' && *p <= '9') {
      count = count * 10 + (*p - '0');
      ++p;
      digits = true;
    }
    if (!digits || p >= hi) return false;
    int code = op_code(*p);
    if (code < 0) return false;
    pool->push_back(static_cast<uint32_t>(count) << 8 |
                    static_cast<uint32_t>(code));
    ++p;
  }
  return true;
}

template <typename T>
T *copy_out(const std::vector<T> &v) {
  T *p = static_cast<T *>(malloc(v.size() * sizeof(T) + 1));
  if (!v.empty()) memcpy(p, v.data(), v.size() * sizeof(T));
  return p;
}

// All pools of one parsed graph, still in host vectors (shared between
// the copy-out ABI below and the direct-to-file converter).
struct Pools {
  std::vector<int64_t> seg_name;
  std::vector<uint32_t> seg_seq, seg_opt;
  std::vector<uint32_t> path_name, path_steps, path_olaps;
  std::vector<uint32_t> link_from, link_to, link_olap;
  std::vector<uint32_t> steps, overlaps, alignment;
  std::vector<uint8_t> seq_data, opt_data, name_data, line_order;
  const uint8_t *header_lo = nullptr, *header_hi = nullptr;
};

}  // namespace

extern "C" {

struct GfaOut {
  uint64_t n_segs;
  int64_t *seg_name;
  uint32_t *seg_seq;   // 2 per seg
  uint32_t *seg_opt;   // 2 per seg
  uint64_t n_paths;
  uint32_t *path_name;   // 2 per path
  uint32_t *path_steps;  // 2 per path
  uint32_t *path_olaps;  // 2 per path
  uint64_t n_links;
  uint32_t *link_from;
  uint32_t *link_to;
  uint32_t *link_olap;  // 2 per link
  uint64_t n_steps;
  uint32_t *steps;
  uint64_t n_seq;
  uint8_t *seq_data;
  uint64_t n_overlaps;
  uint32_t *overlaps;  // 2 per entry
  uint64_t n_align;
  uint32_t *alignment;
  uint64_t n_name_data;
  uint8_t *name_data;
  uint64_t n_opt_data;
  uint8_t *opt_data;
  uint64_t n_lines;
  uint8_t *line_order;
  uint64_t n_header;
  uint8_t *header;
};

int gfa_parse(const uint8_t *buf, uint64_t len, GfaOut *out);

}  // extern "C"

namespace {

// Parse GFA text into pool vectors; returns 0 on success, else the
// error code gfa_parse reports (the caller falls back to NumPy).
int parse_pools(const uint8_t *buf, uint64_t len, Pools *P) {
  std::vector<SegRec> segs;
  std::vector<LinkRec> links;
  std::vector<PathRec> paths;
  std::vector<uint8_t> &line_order = P->line_order;
  const uint8_t *&header_lo = P->header_lo;
  const uint8_t *&header_hi = P->header_hi;

  const uint8_t *p = buf;
  const uint8_t *buf_end = buf + len;
  while (p < buf_end) {
    const uint8_t *nl = static_cast<const uint8_t *>(
        memchr(p, '\n', static_cast<size_t>(buf_end - p)));
    const uint8_t *end = nl ? nl : buf_end;
    if (end == p) {  // blank line
      p = end + 1;
      continue;
    }
    uint8_t kind = *p;
    if (end - p < 2 || p[1] != '\t') return 1;
    const uint8_t *rest = p + 2;

    if (kind == 'H') {
      if (header_lo) return 2;  // multiple headers
      header_lo = rest;
      header_hi = end;
      line_order.push_back(0);
    } else if (kind == 'S') {
      const uint8_t *t1 = find_tab(rest, end);
      if (!t1) return 3;
      SegRec s;
      if (!parse_u64(rest, t1, &s.name)) return 4;
      const uint8_t *t2 = find_tab(t1 + 1, end);
      s.seq_lo = t1 + 1;
      s.seq_hi = t2 ? t2 : end;
      s.opt_lo = t2 ? t2 + 1 : end;
      s.opt_hi = end;
      segs.push_back(s);
      line_order.push_back(1);
    } else if (kind == 'L') {
      LinkRec l;
      const uint8_t *t1 = find_tab(rest, end);
      if (!t1 || !parse_u64(rest, t1, &l.from_name)) return 5;
      const uint8_t *t2 = find_tab(t1 + 1, end);
      if (!t2 || t2 - t1 != 2) return 5;
      if (t1[1] == '-') l.from_rev = 1;
      else if (t1[1] == '+') l.from_rev = 0;
      else return 5;
      const uint8_t *t3 = find_tab(t2 + 1, end);
      if (!t3 || !parse_u64(t2 + 1, t3, &l.to_name)) return 5;
      const uint8_t *t4 = find_tab(t3 + 1, end);
      if (!t4 || t4 - t3 != 2) return 5;
      if (t3[1] == '-') l.to_rev = 1;
      else if (t3[1] == '+') l.to_rev = 0;
      else return 5;
      l.cig_lo = t4 + 1;
      l.cig_hi = end;
      links.push_back(l);
      line_order.push_back(3);
    } else if (kind == 'P') {
      PathRec pr;
      const uint8_t *t1 = find_tab(rest, end);
      if (!t1) return 6;
      const uint8_t *t2 = find_tab(t1 + 1, end);
      if (!t2) return 6;
      const uint8_t *t3 = find_tab(t2 + 1, end);
      pr.name_lo = rest;
      pr.name_hi = t1;
      pr.steps_lo = t1 + 1;
      pr.steps_hi = t2;
      pr.olap_lo = t2 + 1;
      pr.olap_hi = t3 ? t3 : end;
      paths.push_back(pr);
      line_order.push_back(2);
    } else {
      return 7;
    }
    p = end + 1;
  }

  // Name map: sequential 1..N fast path, hash fallback.
  uint64_t n = segs.size();
  bool sequential = true;
  for (uint64_t i = 0; i < n; ++i) {
    if (segs[i].name != static_cast<int64_t>(i) + 1) {
      sequential = false;
      break;
    }
  }
  std::unordered_map<int64_t, uint32_t> name_map;
  if (!sequential) {
    name_map.reserve(n * 2);
    for (uint64_t i = 0; i < n; ++i) {
      name_map.emplace(segs[i].name, static_cast<uint32_t>(i));
    }
  }
  auto lookup = [&](int64_t name, uint32_t *id) -> bool {
    if (sequential) {
      if (name < 1 || name > static_cast<int64_t>(n)) return false;
      *id = static_cast<uint32_t>(name - 1);
      return true;
    }
    auto it = name_map.find(name);
    if (it == name_map.end()) return false;
    *id = it->second;
    return true;
  };

  // Segments: pack sequence/optional bytes.
  std::vector<int64_t> &seg_name = P->seg_name;
  std::vector<uint32_t> &seg_seq = P->seg_seq, &seg_opt = P->seg_opt;
  std::vector<uint8_t> &seq_data = P->seq_data, &opt_data = P->opt_data;
  seg_name.resize(n);
  seg_seq.resize(n * 2);
  seg_opt.resize(n * 2);
  for (uint64_t i = 0; i < n; ++i) {
    const SegRec &s = segs[i];
    seg_name[i] = s.name;
    seg_seq[i * 2] = static_cast<uint32_t>(seq_data.size());
    seq_data.insert(seq_data.end(), s.seq_lo, s.seq_hi);
    seg_seq[i * 2 + 1] = static_cast<uint32_t>(seq_data.size());
    seg_opt[i * 2] = static_cast<uint32_t>(opt_data.size());
    opt_data.insert(opt_data.end(), s.opt_lo, s.opt_hi);
    seg_opt[i * 2 + 1] = static_cast<uint32_t>(opt_data.size());
  }

  // Links: handles + CIGARs (the alignment pool holds link CIGARs
  // first, then path CIGARs, matching the NumPy parser).
  std::vector<uint32_t> &link_from = P->link_from, &link_to = P->link_to,
                        &link_olap = P->link_olap, &overlaps = P->overlaps,
                        &alignment = P->alignment;
  link_from.reserve(links.size());
  for (const LinkRec &l : links) {
    uint32_t f, t;
    if (!lookup(l.from_name, &f) || !lookup(l.to_name, &t)) return 8;
    link_from.push_back(f << 1 | l.from_rev);
    link_to.push_back(t << 1 | l.to_rev);
    uint32_t a_lo = static_cast<uint32_t>(alignment.size());
    if (!parse_cigar(l.cig_lo, l.cig_hi, &alignment)) return 9;
    uint32_t entry = static_cast<uint32_t>(overlaps.size() / 2);
    overlaps.push_back(a_lo);
    overlaps.push_back(static_cast<uint32_t>(alignment.size()));
    link_olap.push_back(entry);
    link_olap.push_back(entry + 1);
  }

  // Paths: names, steps, overlap lists.
  std::vector<uint32_t> &path_name = P->path_name,
                        &path_steps_v = P->path_steps,
                        &path_olaps = P->path_olaps, &steps = P->steps;
  std::vector<uint8_t> &name_data = P->name_data;
  std::vector<std::vector<uint32_t>> deferred_path_cigars;
  for (const PathRec &pr : paths) {
    path_name.push_back(static_cast<uint32_t>(name_data.size()));
    name_data.insert(name_data.end(), pr.name_lo, pr.name_hi);
    path_name.push_back(static_cast<uint32_t>(name_data.size()));

    uint32_t s_lo = static_cast<uint32_t>(steps.size());
    const uint8_t *q = pr.steps_lo;
    while (q < pr.steps_hi) {
      int64_t name = 0;
      bool digits = false;
      while (q < pr.steps_hi && *q >= '0' && *q <= '9') {
        name = name * 10 + (*q - '0');
        ++q;
        digits = true;
      }
      if (!digits || q >= pr.steps_hi) return 10;
      uint8_t rev;
      if (*q == '+') rev = 0;
      else if (*q == '-') rev = 1;
      else return 10;
      ++q;
      if (q < pr.steps_hi) {
        if (*q != ',') return 10;
        ++q;
      }
      uint32_t id;
      if (!lookup(name, &id)) return 11;
      steps.push_back(id << 1 | rev);
    }
    path_steps_v.push_back(s_lo);
    path_steps_v.push_back(static_cast<uint32_t>(steps.size()));

    // Overlap column: '*' or comma-separated CIGARs; entries deferred
    // so the pool keeps link-then-path order.
    std::vector<uint32_t> entries;  // packed per-entry op lists, flat:
                                    // [n_ops, ops...] per entry
    if (!(pr.olap_hi - pr.olap_lo == 1 && *pr.olap_lo == '*')) {
      const uint8_t *c = pr.olap_lo;
      while (c < pr.olap_hi) {
        const uint8_t *comma = static_cast<const uint8_t *>(
            memchr(c, ',', static_cast<size_t>(pr.olap_hi - c)));
        const uint8_t *piece_end = comma ? comma : pr.olap_hi;
        std::vector<uint32_t> ops;
        if (!parse_cigar(c, piece_end, &ops)) return 12;
        entries.push_back(static_cast<uint32_t>(ops.size()));
        entries.insert(entries.end(), ops.begin(), ops.end());
        c = comma ? comma + 1 : pr.olap_hi;
      }
    }
    deferred_path_cigars.push_back(std::move(entries));
  }

  // Unwind deferred path CIGARs into the shared pools.
  for (uint64_t pi = 0; pi < paths.size(); ++pi) {
    const std::vector<uint32_t> &entries = deferred_path_cigars[pi];
    uint32_t e_lo = static_cast<uint32_t>(overlaps.size() / 2);
    size_t k = 0;
    while (k < entries.size()) {
      uint32_t n_ops = entries[k++];
      uint32_t a_lo = static_cast<uint32_t>(alignment.size());
      for (uint32_t j = 0; j < n_ops; ++j) alignment.push_back(entries[k++]);
      overlaps.push_back(a_lo);
      overlaps.push_back(static_cast<uint32_t>(alignment.size()));
    }
    path_olaps.push_back(e_lo);
    path_olaps.push_back(static_cast<uint32_t>(overlaps.size() / 2));
  }

  return 0;
}

}  // namespace

extern "C" {

int gfa_parse(const uint8_t *buf, uint64_t len, GfaOut *out) {
  Pools P;
  int code = parse_pools(buf, len, &P);
  if (code != 0) return code;
  out->n_segs = P.seg_name.size();
  out->seg_name = copy_out(P.seg_name);
  out->seg_seq = copy_out(P.seg_seq);
  out->seg_opt = copy_out(P.seg_opt);
  out->n_paths = P.path_name.size() / 2;
  out->path_name = copy_out(P.path_name);
  out->path_steps = copy_out(P.path_steps);
  out->path_olaps = copy_out(P.path_olaps);
  out->n_links = P.link_from.size();
  out->link_from = copy_out(P.link_from);
  out->link_to = copy_out(P.link_to);
  out->link_olap = copy_out(P.link_olap);
  out->n_steps = P.steps.size();
  out->steps = copy_out(P.steps);
  out->n_seq = P.seq_data.size();
  out->seq_data = copy_out(P.seq_data);
  out->n_overlaps = P.overlaps.size() / 2;
  out->overlaps = copy_out(P.overlaps);
  out->n_align = P.alignment.size();
  out->alignment = copy_out(P.alignment);
  out->n_name_data = P.name_data.size();
  out->name_data = copy_out(P.name_data);
  out->n_opt_data = P.opt_data.size();
  out->opt_data = copy_out(P.opt_data);
  out->n_lines = P.line_order.size();
  out->line_order = copy_out(P.line_order);
  out->n_header =
      P.header_lo ? static_cast<uint64_t>(P.header_hi - P.header_lo) : 0;
  if (P.header_lo) {
    uint8_t *h = static_cast<uint8_t *>(malloc(out->n_header + 1));
    memcpy(h, P.header_lo, out->n_header);
    out->header = h;
  } else {
    out->header = static_cast<uint8_t *>(malloc(1));
  }
  return 0;
}

void gfa_free(GfaOut *out) {
  free(out->seg_name);
  free(out->seg_seq);
  free(out->seg_opt);
  free(out->path_name);
  free(out->path_steps);
  free(out->path_olaps);
  free(out->link_from);
  free(out->link_to);
  free(out->link_olap);
  free(out->steps);
  free(out->seq_data);
  free(out->overlaps);
  free(out->alignment);
  free(out->name_data);
  free(out->opt_data);
  free(out->line_order);
  free(out->header);
}

// Parse GFA text and write the binary FlatGFA file directly — the
// reference's `prealloc_translate` fast path (cli/main.rs:216-248):
// no Python-side pool materialization, one pass from text to file.
// TOC layout matches pollen_tpu/fileformat.py (magic + 11 (len, cap)
// u64 pairs, pools padded to capacity). `spare` reserves extra
// capacity per pool for later in-place mutation. Returns 0 on success,
// the gfa_parse error codes on parse failure, or 100+code on IO error.
int gfa_convert(const uint8_t *buf, uint64_t len, const char *out_path,
                double spare) {
  Pools P;
  int code = parse_pools(buf, len, &P);
  if (code != 0) return code;

  const uint64_t n = P.seg_name.size();
  const uint64_t p = P.path_name.size() / 2;
  const uint64_t l = P.link_from.size();

  // Assemble the AoS record pools (segs 24 B, paths 24 B, links 16 B).
  std::vector<uint8_t> segs(n * 24);
  for (uint64_t i = 0; i < n; ++i) {
    uint8_t *r = segs.data() + i * 24;
    uint64_t name = static_cast<uint64_t>(P.seg_name[i]);
    memcpy(r, &name, 8);
    memcpy(r + 8, &P.seg_seq[i * 2], 8);
    memcpy(r + 16, &P.seg_opt[i * 2], 8);
  }
  std::vector<uint8_t> paths(p * 24);
  for (uint64_t i = 0; i < p; ++i) {
    uint8_t *r = paths.data() + i * 24;
    memcpy(r, &P.path_name[i * 2], 8);
    memcpy(r + 8, &P.path_steps[i * 2], 8);
    memcpy(r + 16, &P.path_olaps[i * 2], 8);
  }
  std::vector<uint8_t> links(l * 16);
  for (uint64_t i = 0; i < l; ++i) {
    uint8_t *r = links.data() + i * 16;
    memcpy(r, &P.link_from[i], 4);
    memcpy(r + 4, &P.link_to[i], 4);
    memcpy(r + 8, &P.link_olap[i * 2], 8);
  }

  const uint64_t header_len =
      P.header_lo ? static_cast<uint64_t>(P.header_hi - P.header_lo) : 0;

  struct PoolDesc {
    const void *data;
    uint64_t len;   // element count
    uint64_t elem;  // element size in bytes
  };
  const PoolDesc pools[11] = {
      {P.header_lo, header_len, 1},
      {segs.data(), n, 24},
      {paths.data(), p, 24},
      {links.data(), l, 16},
      {P.steps.data(), P.steps.size(), 4},
      {P.seq_data.data(), P.seq_data.size(), 1},
      {P.overlaps.data(), P.overlaps.size() / 2, 8},
      {P.alignment.data(), P.alignment.size(), 4},
      {P.name_data.data(), P.name_data.size(), 1},
      {P.opt_data.data(), P.opt_data.size(), 1},
      {P.line_order.data(), P.line_order.size(), 1},
  };

  uint64_t toc[23];
  toc[0] = 0xB1011054ull;  // magic
  uint64_t total = sizeof(toc);
  uint64_t offsets[11];
  for (int i = 0; i < 11; ++i) {
    uint64_t cap =
        pools[i].len + static_cast<uint64_t>(pools[i].len * spare);
    toc[1 + 2 * i] = pools[i].len;
    toc[2 + 2 * i] = cap;
    offsets[i] = total;
    total += cap * pools[i].elem;
  }

  int fd = open(out_path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return 100;
  if (ftruncate(fd, static_cast<off_t>(total)) != 0) {
    close(fd);
    return 101;
  }
  bool ok = pwrite(fd, toc, sizeof(toc), 0) ==
            static_cast<ssize_t>(sizeof(toc));
  for (int i = 0; ok && i < 11; ++i) {
    uint64_t nbytes = pools[i].len * pools[i].elem;
    uint64_t done = 0;
    while (ok && done < nbytes) {
      ssize_t w = pwrite(fd, static_cast<const uint8_t *>(pools[i].data) + done,
                         nbytes - done, static_cast<off_t>(offsets[i] + done));
      if (w <= 0) ok = false;
      else done += static_cast<uint64_t>(w);
    }
  }
  if (close(fd) != 0) ok = false;
  return ok ? 0 : 102;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Emitter: pools -> GFA text (preserved line order).
//
// Native counterpart of pollen_tpu/emit.py::emit_gfa(order="preserved");
// a parse -> emit round trip through this pair is byte-identical.
// ---------------------------------------------------------------------------

namespace {

inline void put_u64(std::vector<uint8_t> *out, int64_t v) {
  char tmp[24];
  int n = 0;
  if (v == 0) {
    tmp[n++] = '0';
  } else {
    while (v > 0) {
      tmp[n++] = static_cast<char>('0' + v % 10);
      v /= 10;
    }
  }
  while (n > 0) out->push_back(static_cast<uint8_t>(tmp[--n]));
}

inline void put_bytes(std::vector<uint8_t> *out, const uint8_t *p, size_t n) {
  out->insert(out->end(), p, p + n);
}

// Append one CIGAR rendering for the overlap-pool entry range
// [e_lo, e_hi); `empty` is used when the range has no entries.
void put_cigars(std::vector<uint8_t> *out, const GfaOut &g, uint32_t e_lo,
                uint32_t e_hi, const char *empty) {
  static const char kOps[] = "MNDI";
  if (e_lo >= e_hi) {
    while (*empty) out->push_back(static_cast<uint8_t>(*empty++));
    return;
  }
  for (uint32_t e = e_lo; e < e_hi; ++e) {
    if (e > e_lo) out->push_back(',');
    uint32_t a_lo = g.overlaps[e * 2], a_hi = g.overlaps[e * 2 + 1];
    if (a_lo == a_hi) {
      out->push_back('0');
      out->push_back('M');
      continue;
    }
    for (uint32_t a = a_lo; a < a_hi; ++a) {
      uint32_t op = g.alignment[a];
      put_u64(out, op >> 8);
      out->push_back(static_cast<uint8_t>(kOps[op & 0xff]));
    }
  }
}

}  // namespace

extern "C" {

// Render the arena as GFA text in preserved line order. The returned
// buffer is malloc'd; the caller frees it with gfa_text_free.
uint8_t *gfa_emit(const GfaOut *g, uint64_t *out_len) {
  std::vector<uint8_t> out;
  // Rough reservation: sequence bytes + ~24 bytes/line of structure.
  out.reserve(g->n_seq + g->n_name_data +
              24 * (g->n_segs + g->n_links + g->n_lines) + 8 * g->n_steps);

  uint64_t si = 0, pi = 0, li = 0;
  for (uint64_t i = 0; i < g->n_lines; ++i) {
    switch (g->line_order[i]) {
      case 0:  // header
        put_bytes(&out, reinterpret_cast<const uint8_t *>("H\t"), 2);
        put_bytes(&out, g->header, g->n_header);
        break;
      case 1: {  // segment
        const uint64_t s = si++;
        put_bytes(&out, reinterpret_cast<const uint8_t *>("S\t"), 2);
        put_u64(&out, g->seg_name[s]);
        out.push_back('\t');
        put_bytes(&out, g->seq_data + g->seg_seq[s * 2],
                  g->seg_seq[s * 2 + 1] - g->seg_seq[s * 2]);
        uint32_t o_lo = g->seg_opt[s * 2], o_hi = g->seg_opt[s * 2 + 1];
        if (o_hi > o_lo) {
          out.push_back('\t');
          put_bytes(&out, g->opt_data + o_lo, o_hi - o_lo);
        }
        break;
      }
      case 2: {  // path
        const uint64_t p = pi++;
        put_bytes(&out, reinterpret_cast<const uint8_t *>("P\t"), 2);
        put_bytes(&out, g->name_data + g->path_name[p * 2],
                  g->path_name[p * 2 + 1] - g->path_name[p * 2]);
        out.push_back('\t');
        uint32_t lo = g->path_steps[p * 2], hi = g->path_steps[p * 2 + 1];
        for (uint32_t s = lo; s < hi; ++s) {
          if (s > lo) out.push_back(',');
          uint32_t h = g->steps[s];
          put_u64(&out, g->seg_name[h >> 1]);
          out.push_back((h & 1) ? '-' : '+');
        }
        out.push_back('\t');
        put_cigars(&out, *g, g->path_olaps[p * 2], g->path_olaps[p * 2 + 1],
                   "*");
        break;
      }
      case 3: {  // link
        const uint64_t l = li++;
        put_bytes(&out, reinterpret_cast<const uint8_t *>("L\t"), 2);
        uint32_t f = g->link_from[l], t = g->link_to[l];
        put_u64(&out, g->seg_name[f >> 1]);
        out.push_back('\t');
        out.push_back((f & 1) ? '-' : '+');
        out.push_back('\t');
        put_u64(&out, g->seg_name[t >> 1]);
        out.push_back('\t');
        out.push_back((t & 1) ? '-' : '+');
        out.push_back('\t');
        put_cigars(&out, *g, g->link_olap[l * 2], g->link_olap[l * 2 + 1],
                   "0M");
        break;
      }
      default:
        *out_len = 0;
        return nullptr;
    }
    out.push_back('\n');
  }

  uint8_t *buf = static_cast<uint8_t *>(malloc(out.size() + 1));
  memcpy(buf, out.data(), out.size());
  *out_len = out.size();
  return buf;
}

void gfa_text_free(uint8_t *buf) { free(buf); }

}  // extern "C"
