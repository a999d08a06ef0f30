// C++ System facade — the reference's libvido_slam.so entry points
// (vido_slam/include/System.h:72-118, src/System.cc:23-240) backed by the
// TPU runtime: the shared library embeds CPython, imports
// `vido_slam_tpu.system`, and forwards Init / TrackRGBD /
// SaveResultsIJRR2020. Works both as a standalone embed (a pure C++ host
// process) and when loaded into an existing Python process (tests drive it
// through ctypes) — the GIL is acquired per call either way.
//
// cv::Mat is not part of this environment, so image arguments are raw
// row-major buffers + shape (the reference's TrackRGBD takes CV_32F
// depth/flow and an 8U/32S semantic mask; System.h:94-99).
//
// Build: make -C native  (g++ -shared -fPIC, links libpython3.12).

#include <Python.h>
#include <dlfcn.h>

#include <cstring>
#include <string>

namespace {

bool g_we_initialized = false;

void ensure_interpreter() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = true;
    // release the GIL acquired by Py_Initialize so per-call
    // PyGILState_Ensure works uniformly
    PyEval_SaveThread();
  }
}

struct Gil {
  PyGILState_STATE st;
  Gil() { st = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(st); }
};

// numpy array view over foreign memory: np.frombuffer(memoryview, dtype)
// .reshape(shape) — avoids the numpy C API entirely.
PyObject* np_view(PyObject* np, const void* data, Py_ssize_t nbytes,
                  const char* dtype, int h, int w, int c) {
  PyObject* mv = PyMemoryView_FromMemory(
      const_cast<char*>(static_cast<const char*>(data)), nbytes, PyBUF_READ);
  if (!mv) return nullptr;
  PyObject* arr = PyObject_CallMethod(np, "frombuffer", "Os", mv, dtype);
  Py_DECREF(mv);
  if (!arr) return nullptr;
  PyObject* out = (c > 1)
      ? PyObject_CallMethod(arr, "reshape", "iii", h, w, c)
      : (w > 1 || h > 1 ? PyObject_CallMethod(arr, "reshape", "ii", h, w)
                        : arr);
  if (out != arr) Py_DECREF(arr);
  return out;
}

struct SystemImpl {
  PyObject* self = nullptr;  // vido_slam_tpu.system.System instance
  PyObject* np = nullptr;
};

}  // namespace

extern "C" {

void* vido_system_create() {
  ensure_interpreter();
  Gil gil;
  // standalone embed: the repo root (this .so lives in <root>/native/) must
  // be importable; harmless no-op when loaded into a host Python process
  Dl_info info;
  if (dladdr(reinterpret_cast<void*>(&vido_system_create), &info) &&
      info.dli_fname) {
    std::string so(info.dli_fname);
    auto cut = so.find_last_of('/');
    std::string dir = cut == std::string::npos ? "." : so.substr(0, cut);
    cut = dir.find_last_of('/');
    std::string root = cut == std::string::npos ? dir : dir.substr(0, cut);
    PyObject* sys = PyImport_ImportModule("sys");
    if (sys) {
      PyObject* path = PyObject_GetAttrString(sys, "path");
      PyObject* s = PyUnicode_FromString(root.c_str());
      if (path && s && !PySequence_Contains(path, s))
        PyList_Append(path, s);
      Py_XDECREF(s); Py_XDECREF(path); Py_DECREF(sys);
    }
  }
  PyObject* mod = PyImport_ImportModule("vido_slam_tpu.system");
  if (!mod) { PyErr_Print(); return nullptr; }
  PyObject* cls = PyObject_GetAttrString(mod, "System");
  Py_DECREF(mod);
  if (!cls) { PyErr_Print(); return nullptr; }
  PyObject* self = PyObject_CallNoArgs(cls);
  Py_DECREF(cls);
  if (!self) { PyErr_Print(); return nullptr; }
  PyObject* np = PyImport_ImportModule("numpy");
  if (!np) { PyErr_Print(); Py_DECREF(self); return nullptr; }
  SystemImpl* impl = new SystemImpl{self, np};
  return impl;
}

// sensor: 0 = MONOCULAR, 1 = STEREO, 2 = RGBD, 3 = IMU_RGBD
// (System.h eSensor; our Sensor enum mirrors it)
int vido_system_init(void* sys, const char* settings_file, int sensor) {
  auto* impl = static_cast<SystemImpl*>(sys);
  Gil gil;
  PyObject* r = PyObject_CallMethod(impl->self, "Init", "si",
                                    settings_file, sensor);
  if (!r) { PyErr_Print(); return -1; }
  Py_DECREF(r);
  return 0;
}

// depth (H,W) f32 raw network values, flow (H,W,2) f32, mask (H,W) i32,
// gray (H,W) f32 or NULL, tcw_gt 16 floats row-major or NULL.
// pose_out: 16 floats (row-major Tcw). Returns 0 on success.
int vido_system_track(void* sys, const float* gray, const float* depth,
                      const float* flow, const int* mask,
                      const float* tcw_gt, double timestamp,
                      int H, int W, float* pose_out) {
  auto* impl = static_cast<SystemImpl*>(sys);
  Gil gil;
  const Py_ssize_t n = static_cast<Py_ssize_t>(H) * W;
  PyObject* a_depth = np_view(impl->np, depth, n * 4, "float32", H, W, 1);
  PyObject* a_flow = np_view(impl->np, flow, n * 8, "float32", H, W, 2);
  PyObject* a_mask = np_view(impl->np, mask, n * 4, "int32", H, W, 1);
  PyObject* a_gray = gray
      ? np_view(impl->np, gray, n * 4, "float32", H, W, 1) : Py_NewRef(Py_None);
  PyObject* a_gt = tcw_gt
      ? np_view(impl->np, tcw_gt, 64, "float32", 4, 4, 1) : Py_NewRef(Py_None);
  PyObject* r = nullptr;
  if (a_depth && a_flow && a_mask && a_gray && a_gt) {
    r = PyObject_CallMethod(impl->self, "TrackRGBD", "OOOOOOd",
                            a_gray, a_depth, a_flow, a_mask, a_gt,
                            Py_None, timestamp);
  }
  Py_XDECREF(a_depth); Py_XDECREF(a_flow); Py_XDECREF(a_mask);
  Py_XDECREF(a_gray); Py_XDECREF(a_gt);
  if (!r) { PyErr_Print(); return -1; }
  // pose_out <- np.asarray(r, float32).reshape(-1)
  PyObject* flat = PyObject_CallMethod(impl->np, "ascontiguousarray", "Os",
                                       r, "float32");
  Py_DECREF(r);
  if (!flat) { PyErr_Print(); return -1; }
  PyObject* bytes = PyObject_CallMethod(flat, "tobytes", nullptr);
  Py_DECREF(flat);
  if (!bytes) { PyErr_Print(); return -1; }
  char* buf = nullptr;
  Py_ssize_t len = 0;
  PyBytes_AsStringAndSize(bytes, &buf, &len);
  if (len >= 64) std::memcpy(pose_out, buf, 64);
  Py_DECREF(bytes);
  return len >= 64 ? 0 : -1;
}

// Init with extra Tracker keyword arguments as a JSON object string,
// e.g. {"n_bg": 600, "n_obj": 1500, "max_objects": 4}.
int vido_system_init_ex(void* sys, const char* settings_file, int sensor,
                        const char* json_kwargs) {
  auto* impl = static_cast<SystemImpl*>(sys);
  Gil gil;
  PyObject* json = PyImport_ImportModule("json");
  if (!json) { PyErr_Print(); return -1; }
  PyObject* kwargs = PyObject_CallMethod(json, "loads", "s", json_kwargs);
  Py_DECREF(json);
  if (!kwargs) { PyErr_Print(); return -1; }
  PyObject* meth = PyObject_GetAttrString(impl->self, "Init");
  PyObject* args = Py_BuildValue("(si)", settings_file, sensor);
  PyObject* r = meth && args ? PyObject_Call(meth, args, kwargs) : nullptr;
  Py_XDECREF(meth); Py_XDECREF(args); Py_DECREF(kwargs);
  if (!r) { PyErr_Print(); return -1; }
  Py_DECREF(r);
  return 0;
}

// VIO overload (System.h:98-100): imu = n_imu rows of
// (ax, ay, az, wx, wy, wz, t) float64. Other arguments as vido_system_track.
int vido_system_track_imu(void* sys, const float* gray, const float* depth,
                          const float* flow, const int* mask,
                          const float* tcw_gt, double timestamp,
                          const double* imu, int n_imu,
                          int H, int W, float* pose_out) {
  auto* impl = static_cast<SystemImpl*>(sys);
  Gil gil;
  const Py_ssize_t n = static_cast<Py_ssize_t>(H) * W;
  PyObject* a_depth = np_view(impl->np, depth, n * 4, "float32", H, W, 1);
  PyObject* a_flow = np_view(impl->np, flow, n * 8, "float32", H, W, 2);
  PyObject* a_mask = np_view(impl->np, mask, n * 4, "int32", H, W, 1);
  PyObject* a_gray = gray
      ? np_view(impl->np, gray, n * 4, "float32", H, W, 1) : Py_NewRef(Py_None);
  PyObject* a_gt = tcw_gt
      ? np_view(impl->np, tcw_gt, 64, "float32", 4, 4, 1) : Py_NewRef(Py_None);
  PyObject* a_imu = (imu && n_imu > 0)
      ? np_view(impl->np, imu, static_cast<Py_ssize_t>(n_imu) * 7 * 8,
                "float64", n_imu, 7, 1)
      : Py_NewRef(Py_None);
  PyObject* r = nullptr;
  if (a_depth && a_flow && a_mask && a_gray && a_gt && a_imu) {
    r = PyObject_CallMethod(impl->self, "TrackRGBDWithIMUArray", "OOOOOdO",
                            a_gray, a_depth, a_flow, a_mask, a_gt,
                            timestamp, a_imu);
  }
  Py_XDECREF(a_depth); Py_XDECREF(a_flow); Py_XDECREF(a_mask);
  Py_XDECREF(a_gray); Py_XDECREF(a_gt); Py_XDECREF(a_imu);
  if (!r) { PyErr_Print(); return -1; }
  PyObject* flat = PyObject_CallMethod(impl->np, "ascontiguousarray", "Os",
                                       r, "float32");
  Py_DECREF(r);
  if (!flat) { PyErr_Print(); return -1; }
  PyObject* bytes = PyObject_CallMethod(flat, "tobytes", nullptr);
  Py_DECREF(flat);
  if (!bytes) { PyErr_Print(); return -1; }
  char* buf = nullptr;
  Py_ssize_t len = 0;
  PyBytes_AsStringAndSize(bytes, &buf, &len);
  if (len >= 64) std::memcpy(pose_out, buf, 64);
  Py_DECREF(bytes);
  return len >= 64 ? 0 : -1;
}

// Per-frame scene objects (OutPut.h:35-72): fills up to max_n rows of
// 10 doubles [tracking_id, label_index, pos_xyz, vel_xyz, yaw, speed_kmh]
// for frame_index (-1 = latest). Returns the object count, or -1 on error.
int vido_system_get_objects(void* sys, int frame_index, double* out,
                            int max_n) {
  auto* impl = static_cast<SystemImpl*>(sys);
  Gil gil;
  PyObject* r = PyObject_CallMethod(impl->self, "GetFrameOutputArray", "i",
                                    frame_index);
  if (!r) { PyErr_Print(); return -1; }
  PyObject* flat = PyObject_CallMethod(impl->np, "ascontiguousarray", "Os",
                                       r, "float64");
  Py_DECREF(r);
  if (!flat) { PyErr_Print(); return -1; }
  PyObject* bytes = PyObject_CallMethod(flat, "tobytes", nullptr);
  Py_DECREF(flat);
  if (!bytes) { PyErr_Print(); return -1; }
  char* buf = nullptr;
  Py_ssize_t len = 0;
  PyBytes_AsStringAndSize(bytes, &buf, &len);
  const int n_rows = static_cast<int>(len / (10 * 8));
  const int n_copy = n_rows < max_n ? n_rows : max_n;
  if (out && n_copy > 0) std::memcpy(out, buf, n_copy * 10 * 8);
  Py_DECREF(bytes);
  return n_rows;
}

int vido_system_save(void* sys, const char* path) {
  auto* impl = static_cast<SystemImpl*>(sys);
  Gil gil;
  PyObject* r = PyObject_CallMethod(impl->self, "SaveResultsIJRR2020", "s",
                                    path);
  if (!r) { PyErr_Print(); return -1; }
  Py_DECREF(r);
  return 0;
}

void vido_system_destroy(void* sys) {
  auto* impl = static_cast<SystemImpl*>(sys);
  if (impl) {
    Gil gil;
    Py_XDECREF(impl->self);
    Py_XDECREF(impl->np);
    delete impl;
  }
}

}  // extern "C"
