// Native fast5 reader: minimal HDF5 C-API client loaded via dlopen.
//
// This image ships no HDF5 development headers; h5py bundles its own
// libhdf5 (1.14 ABI). We dlopen that library (path supplied by Python)
// and declare only the dozen entry points the fast5 layout needs, so the
// reader has zero build-time dependencies. All numeric dataset/attr
// reads go through HDF5's own type conversion to native doubles/int64s,
// which keeps this robust across the albacore-v1 (float seconds) and
// v2/guppy (uint64 samples) flavors.
//
// C ABI: dmt_f5_init(libpath) once, then per file
//   h = dmt_f5_open(path, basecall_group)  ->  getters  ->  dmt_f5_free(h).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <string>
#include <vector>

typedef int64_t hid_t;
typedef int herr_t;
typedef unsigned long long hsize_t_;
typedef int H5_index_t_;
typedef int H5_iter_order_t_;

namespace {

struct H5Api {
  herr_t (*H5open)();
  hid_t (*H5Fopen)(const char*, unsigned, hid_t);
  herr_t (*H5Fclose)(hid_t);
  hid_t (*H5Dopen2)(hid_t, const char*, hid_t);
  herr_t (*H5Dclose)(hid_t);
  hid_t (*H5Dget_type)(hid_t);
  hid_t (*H5Dget_space)(hid_t);
  herr_t (*H5Dread)(hid_t, hid_t, hid_t, hid_t, hid_t, void*);
  hid_t (*H5Sget_simple_extent_npoints)(hid_t);
  herr_t (*H5Sclose)(hid_t);
  hid_t (*H5Aopen_by_name)(hid_t, const char*, const char*, hid_t, hid_t);
  herr_t (*H5Aread)(hid_t, hid_t, void*);
  herr_t (*H5Aclose)(hid_t);
  hid_t (*H5Aget_type)(hid_t);
  int (*H5Tget_class)(hid_t);
  size_t (*H5Tget_size)(hid_t);
  int (*H5Tis_variable_str)(hid_t);
  hid_t (*H5Tcreate)(int, size_t);
  hid_t (*H5Tcopy)(hid_t);
  herr_t (*H5Tset_size)(hid_t, size_t);
  herr_t (*H5Tinsert)(hid_t, const char*, size_t, hid_t);
  herr_t (*H5Tclose)(hid_t);
  int (*H5Tget_nmembers)(hid_t);
  char* (*H5Tget_member_name)(hid_t, unsigned);
  herr_t (*H5free_memory)(void*);
  hid_t (*H5Gopen2)(hid_t, const char*, hid_t);
  herr_t (*H5Gclose)(hid_t);
  herr_t (*H5Literate2)(hid_t, int, int, hsize_t_*,
                        herr_t (*)(hid_t, const char*, const void*, void*),
                        void*);
  // global native type handles (valid after H5open)
  hid_t native_double;
  hid_t native_int64;
  hid_t native_float;
  hid_t c_s1;
  bool ready = false;
};

H5Api api;

template <typename T>
bool load_sym(void* lib, const char* name, T* out) {
  *out = reinterpret_cast<T>(dlsym(lib, name));
  return *out != nullptr;
}

herr_t first_link_cb(hid_t, const char* name, const void*, void* op_data) {
  std::string* out = static_cast<std::string*>(op_data);
  *out = name;
  return 1;  // stop after first
}

struct Fast5Data {
  int status = 0;  // 0 ok; negative = error code
  double sampling_rate = 0;
  long long raw_start_time = -1;  // -1 = attr absent (v1 path rejects)
  std::string version;
  std::string fastq;
  std::vector<double> signal;
  // events (empty when move table in use)
  std::vector<double> ev_mean, ev_stdv, ev_start, ev_length;
  std::vector<int64_t> ev_move;
  std::vector<char> ev_state;  // 5 bytes per event
  size_t n_events = 0;
  size_t state_width = 0;
  // move table
  std::vector<int64_t> move;
  long long first_sample_template = -1;
};

bool read_string_attr(hid_t root, const char* obj, const char* attr,
                      std::string* out) {
  hid_t aid = api.H5Aopen_by_name(root, obj, attr, 0, 0);
  if (aid < 0) return false;
  hid_t tid = api.H5Aget_type(aid);
  bool ok = false;
  if (api.H5Tis_variable_str(tid) > 0) {
    char* ptr = nullptr;
    hid_t mem = api.H5Tcopy(api.c_s1);
    api.H5Tset_size(mem, (size_t)-1);  // H5T_VARIABLE
    if (api.H5Aread(aid, mem, &ptr) >= 0 && ptr) {
      *out = ptr;
      api.H5free_memory(ptr);
      ok = true;
    }
    api.H5Tclose(mem);
  } else {
    size_t n = api.H5Tget_size(tid);
    std::vector<char> buf(n + 1, 0);
    hid_t mem = api.H5Tcopy(api.c_s1);
    api.H5Tset_size(mem, n);
    if (api.H5Aread(aid, mem, buf.data()) >= 0) {
      *out = std::string(buf.data(), strnlen(buf.data(), n));
      ok = true;
    }
    api.H5Tclose(mem);
  }
  api.H5Tclose(tid);
  api.H5Aclose(aid);
  return ok;
}

bool read_scalar_attr_double(hid_t root, const char* obj, const char* attr,
                             double* out) {
  hid_t aid = api.H5Aopen_by_name(root, obj, attr, 0, 0);
  if (aid < 0) return false;
  bool ok = api.H5Aread(aid, api.native_double, out) >= 0;
  api.H5Aclose(aid);
  return ok;
}

bool read_scalar_attr_int64(hid_t root, const char* obj, const char* attr,
                            long long* out) {
  hid_t aid = api.H5Aopen_by_name(root, obj, attr, 0, 0);
  if (aid < 0) return false;
  int64_t v = 0;
  bool ok = api.H5Aread(aid, api.native_int64, &v) >= 0;
  *out = v;
  api.H5Aclose(aid);
  return ok;
}

bool read_numeric_field(hid_t did, const char* field, size_t n,
                        std::vector<double>* out) {
  hid_t mem = api.H5Tcreate(6 /*H5T_COMPOUND*/, sizeof(double));
  api.H5Tinsert(mem, field, 0, api.native_double);
  out->resize(n);
  bool ok = api.H5Dread(did, mem, 0, 0, 0, out->data()) >= 0;
  api.H5Tclose(mem);
  return ok;
}

bool read_int_field(hid_t did, const char* field, size_t n,
                    std::vector<int64_t>* out) {
  hid_t mem = api.H5Tcreate(6, sizeof(int64_t));
  api.H5Tinsert(mem, field, 0, api.native_int64);
  out->resize(n);
  bool ok = api.H5Dread(did, mem, 0, 0, 0, out->data()) >= 0;
  api.H5Tclose(mem);
  return ok;
}

}  // namespace

extern "C" {

int dmt_f5_init(const char* libhdf5_path) {
  if (api.ready) return 0;
  void* lib = dlopen(libhdf5_path, RTLD_NOW | RTLD_GLOBAL);
  if (!lib) return -1;
  bool ok = true;
  ok &= load_sym(lib, "H5open", &api.H5open);
  ok &= load_sym(lib, "H5Fopen", &api.H5Fopen);
  ok &= load_sym(lib, "H5Fclose", &api.H5Fclose);
  ok &= load_sym(lib, "H5Dopen2", &api.H5Dopen2);
  ok &= load_sym(lib, "H5Dclose", &api.H5Dclose);
  ok &= load_sym(lib, "H5Dget_type", &api.H5Dget_type);
  ok &= load_sym(lib, "H5Dget_space", &api.H5Dget_space);
  ok &= load_sym(lib, "H5Dread", &api.H5Dread);
  ok &= load_sym(lib, "H5Sget_simple_extent_npoints",
                 &api.H5Sget_simple_extent_npoints);
  ok &= load_sym(lib, "H5Sclose", &api.H5Sclose);
  ok &= load_sym(lib, "H5Aopen_by_name", &api.H5Aopen_by_name);
  ok &= load_sym(lib, "H5Aread", &api.H5Aread);
  ok &= load_sym(lib, "H5Aclose", &api.H5Aclose);
  ok &= load_sym(lib, "H5Aget_type", &api.H5Aget_type);
  ok &= load_sym(lib, "H5Tget_class", &api.H5Tget_class);
  ok &= load_sym(lib, "H5Tget_size", &api.H5Tget_size);
  ok &= load_sym(lib, "H5Tis_variable_str", &api.H5Tis_variable_str);
  ok &= load_sym(lib, "H5Tcreate", &api.H5Tcreate);
  ok &= load_sym(lib, "H5Tcopy", &api.H5Tcopy);
  ok &= load_sym(lib, "H5Tset_size", &api.H5Tset_size);
  ok &= load_sym(lib, "H5Tinsert", &api.H5Tinsert);
  ok &= load_sym(lib, "H5Tclose", &api.H5Tclose);
  ok &= load_sym(lib, "H5Tget_nmembers", &api.H5Tget_nmembers);
  ok &= load_sym(lib, "H5Tget_member_name", &api.H5Tget_member_name);
  ok &= load_sym(lib, "H5free_memory", &api.H5free_memory);
  ok &= load_sym(lib, "H5Gopen2", &api.H5Gopen2);
  ok &= load_sym(lib, "H5Gclose", &api.H5Gclose);
  ok &= load_sym(lib, "H5Literate2", &api.H5Literate2);
  if (!ok) return -2;
  if (api.H5open() < 0) return -3;
  hid_t* p;
  if (!load_sym(lib, "H5T_NATIVE_DOUBLE_g", &p)) return -4;
  api.native_double = *p;
  if (!load_sym(lib, "H5T_NATIVE_LLONG_g", &p)) return -4;
  api.native_int64 = *p;
  if (!load_sym(lib, "H5T_NATIVE_FLOAT_g", &p)) return -4;
  api.native_float = *p;
  if (!load_sym(lib, "H5T_C_S1_g", &p)) return -4;
  api.c_s1 = *p;
  api.ready = true;
  return 0;
}

void* dmt_f5_open(const char* path, const char* basecall_group,
                  const char* strand_group, int use_move) {
  auto* d = new Fast5Data();
  if (!api.ready) {
    d->status = -100;
    return d;
  }
  hid_t fid = api.H5Fopen(path, 0 /*RDONLY*/, 0);
  if (fid < 0) {
    d->status = -1;
    return d;
  }
  // channel info
  if (!read_scalar_attr_double(fid, "UniqueGlobalKey/channel_id",
                               "sampling_rate", &d->sampling_rate)) {
    d->status = -2;
    api.H5Fclose(fid);
    return d;
  }
  std::string base = std::string("/Analyses/") + basecall_group;
  read_string_attr(fid, base.c_str(), "version", &d->version);

  // fastq
  std::string fq_path = base + "/" + strand_group + "/Fastq";
  hid_t did = api.H5Dopen2(fid, fq_path.c_str(), 0);
  if (did < 0) {
    d->status = -3;
    api.H5Fclose(fid);
    return d;
  }
  hid_t tid = api.H5Dget_type(did);
  if (api.H5Tis_variable_str(tid) > 0) {
    char* ptr = nullptr;
    hid_t mem = api.H5Tcopy(api.c_s1);
    api.H5Tset_size(mem, (size_t)-1);
    if (api.H5Dread(did, mem, 0, 0, 0, &ptr) >= 0 && ptr) {
      d->fastq = ptr;
      api.H5free_memory(ptr);
    }
    api.H5Tclose(mem);
  } else {
    size_t n = api.H5Tget_size(tid);
    std::vector<char> buf(n + 1, 0);
    hid_t mem = api.H5Tcopy(api.c_s1);
    api.H5Tset_size(mem, n);
    if (api.H5Dread(did, mem, 0, 0, 0, buf.data()) >= 0)
      d->fastq = std::string(buf.data(), strnlen(buf.data(), n));
    api.H5Tclose(mem);
  }
  api.H5Tclose(tid);
  api.H5Dclose(did);

  // raw signal: first child of /Raw/Reads
  std::string read_name;
  hid_t gid = api.H5Gopen2(fid, "/Raw/Reads", 0);
  if (gid < 0) {
    d->status = -4;
    api.H5Fclose(fid);
    return d;
  }
  hsize_t_ idx = 0;
  api.H5Literate2(gid, 0 /*NAME*/, 0 /*INC*/, &idx, first_link_cb, &read_name);
  api.H5Gclose(gid);
  if (read_name.empty()) {
    d->status = -4;
    api.H5Fclose(fid);
    return d;
  }
  std::string raw_group = std::string("/Raw/Reads/") + read_name;
  read_scalar_attr_int64(fid, raw_group.c_str(), "start_time",
                         &d->raw_start_time);
  std::string sig_path = raw_group + "/Signal";
  did = api.H5Dopen2(fid, sig_path.c_str(), 0);
  if (did < 0) {
    d->status = -5;
    api.H5Fclose(fid);
    return d;
  }
  hid_t sid = api.H5Dget_space(did);
  long long n_sig = api.H5Sget_simple_extent_npoints(sid);
  api.H5Sclose(sid);
  d->signal.resize(n_sig);
  if (api.H5Dread(did, api.native_double, 0, 0, 0, d->signal.data()) < 0)
    d->status = -5;
  api.H5Dclose(did);
  if (d->status != 0) {
    api.H5Fclose(fid);
    return d;
  }

  if (use_move) {
    std::string mv_path = base + "/" + strand_group + "/Move";
    did = api.H5Dopen2(fid, mv_path.c_str(), 0);
    if (did < 0) {
      d->status = -6;
      api.H5Fclose(fid);
      return d;
    }
    sid = api.H5Dget_space(did);
    long long n = api.H5Sget_simple_extent_npoints(sid);
    api.H5Sclose(sid);
    d->move.resize(n);
    if (api.H5Dread(did, api.native_int64, 0, 0, 0, d->move.data()) < 0)
      d->status = -6;
    api.H5Dclose(did);
    // segmentation attrs
    std::string seg = basecall_group;
    size_t us = seg.rfind('_');
    std::string seg_group = std::string("/Analyses/Segmentation_") +
                            (us == std::string::npos ? "000"
                                                     : seg.substr(us + 1)) +
                            "/Summary/segmentation";
    read_scalar_attr_int64(fid, seg_group.c_str(), "first_sample_template",
                           &d->first_sample_template);
  } else {
    std::string ev_path = base + "/" + strand_group + "/Events";
    did = api.H5Dopen2(fid, ev_path.c_str(), 0);
    if (did < 0) {
      d->status = -7;
      api.H5Fclose(fid);
      return d;
    }
    sid = api.H5Dget_space(did);
    long long n = api.H5Sget_simple_extent_npoints(sid);
    api.H5Sclose(sid);
    d->n_events = (size_t)n;
    bool ok = read_numeric_field(did, "mean", n, &d->ev_mean) &&
              read_numeric_field(did, "stdv", n, &d->ev_stdv) &&
              read_numeric_field(did, "start", n, &d->ev_start) &&
              read_numeric_field(did, "length", n, &d->ev_length) &&
              read_int_field(did, "move", n, &d->ev_move);
    if (ok) {
      // model_state is read through a width-5 string member: HDF5's
      // type conversion truncates longer file-side strings, which is
      // the pipeline contract anyway — the event table stores U5 states
      // (reference m_event dtype, myDetect.py:234), matching the h5py
      // path's astype('S5').
      size_t width = 5;
      hid_t str_t = api.H5Tcopy(api.c_s1);
      api.H5Tset_size(str_t, width);
      hid_t mem = api.H5Tcreate(6, width);
      api.H5Tinsert(mem, "model_state", 0, str_t);
      d->ev_state.assign(n * width, 0);
      ok = api.H5Dread(did, mem, 0, 0, 0, d->ev_state.data()) >= 0;
      d->state_width = width;
      api.H5Tclose(mem);
      api.H5Tclose(str_t);
    }
    if (!ok) d->status = -7;
    api.H5Dclose(did);
  }
  api.H5Fclose(fid);
  return d;
}

int dmt_f5_status(void* h) { return static_cast<Fast5Data*>(h)->status; }
double dmt_f5_sampling_rate(void* h) {
  return static_cast<Fast5Data*>(h)->sampling_rate;
}
long long dmt_f5_start_time(void* h) {
  return static_cast<Fast5Data*>(h)->raw_start_time;
}
const char* dmt_f5_version(void* h) {
  return static_cast<Fast5Data*>(h)->version.c_str();
}
const char* dmt_f5_fastq(void* h) {
  return static_cast<Fast5Data*>(h)->fastq.c_str();
}
long long dmt_f5_signal_len(void* h) {
  return (long long)static_cast<Fast5Data*>(h)->signal.size();
}
void dmt_f5_signal(void* h, double* out) {
  auto* d = static_cast<Fast5Data*>(h);
  memcpy(out, d->signal.data(), d->signal.size() * sizeof(double));
}
long long dmt_f5_n_events(void* h) {
  return (long long)static_cast<Fast5Data*>(h)->n_events;
}
void dmt_f5_events(void* h, double* mean, double* stdv, double* start,
                   double* length, int64_t* move, char* state) {
  auto* d = static_cast<Fast5Data*>(h);
  size_t n = d->n_events;
  memcpy(mean, d->ev_mean.data(), n * sizeof(double));
  memcpy(stdv, d->ev_stdv.data(), n * sizeof(double));
  memcpy(start, d->ev_start.data(), n * sizeof(double));
  memcpy(length, d->ev_length.data(), n * sizeof(double));
  memcpy(move, d->ev_move.data(), n * sizeof(int64_t));
  memcpy(state, d->ev_state.data(), n * d->state_width);
}
// Fill a packed numpy structured array directly (one call, no per-field
// temporaries): dtype [(mean f8)(stdv f8)(start f8|u8)(length f8|u8)
// (model_state S5)(move i8)] -> offsets 0/8/16/24/32/37, itemsize 45.
// start_as_u64 selects the Albacore-v2 integer start/length layout
// (float->uint64 truncation; negatives clamp to 0 instead of UB).
void dmt_f5_events_packed(void* h, char* dst, int start_as_u64) {
  auto* d = static_cast<Fast5Data*>(h);
  const size_t n = d->n_events;
  const size_t stride = 45;
  for (size_t i = 0; i < n; ++i) {
    char* p = dst + i * stride;
    memcpy(p, &d->ev_mean[i], 8);
    memcpy(p + 8, &d->ev_stdv[i], 8);
    if (start_as_u64) {
      const double sv = d->ev_start[i], lv = d->ev_length[i];
      const uint64_t s = sv > 0 ? (uint64_t)sv : 0;
      const uint64_t l = lv > 0 ? (uint64_t)lv : 0;
      memcpy(p + 16, &s, 8);
      memcpy(p + 24, &l, 8);
    } else {
      memcpy(p + 16, &d->ev_start[i], 8);
      memcpy(p + 24, &d->ev_length[i], 8);
    }
    memcpy(p + 32, d->ev_state.data() + i * d->state_width, 5);
    memcpy(p + 37, &d->ev_move[i], 8);
  }
}

long long dmt_f5_move_len(void* h) {
  return (long long)static_cast<Fast5Data*>(h)->move.size();
}
void dmt_f5_move(void* h, int64_t* out) {
  auto* d = static_cast<Fast5Data*>(h);
  memcpy(out, d->move.data(), d->move.size() * sizeof(int64_t));
}
long long dmt_f5_first_sample(void* h) {
  return static_cast<Fast5Data*>(h)->first_sample_template;
}
void dmt_f5_free(void* h) { delete static_cast<Fast5Data*>(h); }

}  // extern "C"
