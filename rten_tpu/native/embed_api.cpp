// In-process C embedding API for rten_tpu — the TPU-era analog of the
// reference's WASM/JS binding (reference: src/wasm_api.rs:15-211, index.js):
// load a .rten model and run it from ANY language with a C FFI, inside the
// caller's process. The implementation embeds CPython (the runtime the
// framework's graph layer lives in) and drives the same Model/RunOptions
// surface the Python API exposes; compute still runs through JAX/XLA on the
// configured backend.
//
// Build: python -m rten_tpu.native.build (produces librten_embed.so).
// Every entry point is GIL-safe: callers may invoke from any thread.
//
//   rten_init(repo_path)        — start the interpreter, import rten_tpu
//   m  = rten_model_load_file(path) / rten_model_load(bytes, len)
//   t  = rten_tensor_f32(data, shape, ndim)   (also _i32)
//   n  = rten_model_run(m, inputs, n_in, outputs, max_out)
//   rten_tensor_ndim/shape/data_f32/data_i32, rten_tensor_free
//   rten_model_input_count/_name, _output_count/_name
//   rten_last_error()           — human-readable failure reason

#include <Python.h>

#include <cstring>
#include <string>

namespace {

// Per-thread: errors and returned-name storage must not race between
// threads (every entry point is callable from any thread).
thread_local std::string g_error;
thread_local std::string g_name_scratch;
PyThreadState *g_main_state = nullptr;

struct Gil {
  PyGILState_STATE st;
  Gil() { st = PyGILState_Ensure(); }
  ~Gil() { PyGILState_Release(st); }
};

void set_error_from_python() {
  PyObject *type, *value, *trace;
  PyErr_Fetch(&type, &value, &trace);
  g_error = "unknown python error";
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      const char *utf8 = PyUnicode_AsUTF8(s);
      if (utf8) g_error = utf8;
      Py_DECREF(s);
    }
    PyErr_Clear();  // AsUTF8/Str may themselves have set an exception
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(trace);
}

struct Tensor {
  PyObject *array = nullptr;  // contiguous numpy array
  Py_buffer view{};
  bool has_view = false;

  ~Tensor() {
    Gil gil;
    if (has_view) PyBuffer_Release(&view);
    Py_XDECREF(array);
  }
  bool acquire_view() {
    if (has_view) return true;
    if (PyObject_GetBuffer(array, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
      set_error_from_python();
      return false;
    }
    has_view = true;
    return true;
  }
};

struct Model {
  PyObject *model = nullptr;  // rten_tpu.runtime.session.Model
  ~Model() {
    Gil gil;
    Py_XDECREF(model);
  }
};

PyObject *np_module() {
  static PyObject *np = PyImport_ImportModule("numpy");
  return np;
}

PyObject *make_array(const void *data, const int *shape, int ndim,
                     const char *dtype, size_t itemsize) {
  long total = 1;
  for (int i = 0; i < ndim; ++i) total *= shape[i];
  PyObject *np = np_module();
  if (!np) return nullptr;
  PyObject *bytes =
      PyBytes_FromStringAndSize(static_cast<const char *>(data), total * itemsize);
  if (!bytes) return nullptr;
  PyObject *flat = PyObject_CallMethod(np, "frombuffer", "Os", bytes, dtype);
  Py_DECREF(bytes);
  if (!flat) return nullptr;
  PyObject *dims = PyTuple_New(ndim);
  for (int i = 0; i < ndim; ++i)
    PyTuple_SET_ITEM(dims, i, PyLong_FromLong(shape[i]));
  PyObject *shaped = PyObject_CallMethod(flat, "reshape", "O", dims);
  Py_DECREF(flat);
  Py_DECREF(dims);
  if (!shaped) return nullptr;
  PyObject *owned = PyObject_CallMethod(shaped, "copy", nullptr);
  Py_DECREF(shaped);
  return owned;
}

}  // namespace

extern "C" {

const char *rten_last_error(void) { return g_error.c_str(); }

// Start the embedded interpreter (idempotent). ``python_path`` (optional,
// may be NULL) is prepended to sys.path so rten_tpu resolves — pass the
// repo/site-packages root when embedding outside an installed environment.
int rten_init(const char *python_path) {
  if (Py_IsInitialized()) return 0;
  Py_InitializeEx(0);
  if (python_path && *python_path) {
    PyObject *sys_path = PySys_GetObject("path");  // borrowed
    PyObject *p = PyUnicode_FromString(python_path);
    PyList_Insert(sys_path, 0, p);
    Py_DECREF(p);
  }
  // The site layer may have pinned a remote accelerator backend before we
  // get control (env vars alone don't override it); re-apply JAX_PLATFORMS
  // through the config API before any device use so embedded callers can
  // choose their backend.
  PyRun_SimpleString(
      "import os as _os\n"
      "_p = _os.environ.get('JAX_PLATFORMS')\n"
      "if _p:\n"
      "    import jax as _jax\n"
      "    _jax.config.update('jax_platforms', _p)\n");
  PyObject *mod = PyImport_ImportModule("rten_tpu.runtime.session");
  if (!mod) {
    set_error_from_python();
    // Leave the interpreter up; the caller can fix sys.path and retry
    // imports via a fresh process.
    g_main_state = PyEval_SaveThread();
    return -1;
  }
  Py_DECREF(mod);
  // Release the GIL so any thread (including this one, via Gil) can call in.
  g_main_state = PyEval_SaveThread();
  return 0;
}

void rten_shutdown(void) {
  if (!Py_IsInitialized()) return;
  if (g_main_state) PyEval_RestoreThread(g_main_state);
  Py_FinalizeEx();
  g_main_state = nullptr;
}

void *rten_model_load(const void *data, long len) {
  Gil gil;
  PyObject *mod = PyImport_ImportModule("rten_tpu.runtime.session");
  if (!mod) {
    set_error_from_python();
    return nullptr;
  }
  PyObject *cls = PyObject_GetAttrString(mod, "Model");
  Py_DECREF(mod);
  PyObject *bytes = PyBytes_FromStringAndSize(static_cast<const char *>(data), len);
  PyObject *model = PyObject_CallMethod(cls, "load", "O", bytes);
  Py_DECREF(bytes);
  Py_DECREF(cls);
  if (!model) {
    set_error_from_python();
    return nullptr;
  }
  Model *m = new Model();
  m->model = model;
  return m;
}

void *rten_model_load_file(const char *path) {
  Gil gil;
  PyObject *mod = PyImport_ImportModule("rten_tpu.runtime.session");
  if (!mod) {
    set_error_from_python();
    return nullptr;
  }
  PyObject *cls = PyObject_GetAttrString(mod, "Model");
  Py_DECREF(mod);
  PyObject *model = PyObject_CallMethod(cls, "load_file", "s", path);
  Py_DECREF(cls);
  if (!model) {
    set_error_from_python();
    return nullptr;
  }
  Model *m = new Model();
  m->model = model;
  return m;
}

void rten_model_free(void *handle) { delete static_cast<Model *>(handle); }

static int name_count(void *handle, const char *method) {
  Gil gil;
  Model *m = static_cast<Model *>(handle);
  PyObject *names = PyObject_CallMethod(m->model, method, nullptr);
  if (!names) {
    set_error_from_python();
    return -1;
  }
  int n = static_cast<int>(PyList_Size(names));
  Py_DECREF(names);
  return n;
}

static const char *name_at(void *handle, const char *method, int i) {
  Gil gil;
  Model *m = static_cast<Model *>(handle);
  PyObject *names = PyObject_CallMethod(m->model, method, nullptr);
  if (!names) {
    set_error_from_python();
    return nullptr;
  }
  PyObject *item = PyList_GetItem(names, i);  // borrowed
  const char *utf8 = item ? PyUnicode_AsUTF8(item) : nullptr;
  if (!utf8) PyErr_Clear();
  // thread_local storage: the returned pointer stays valid until THIS
  // thread's next name_at call, regardless of other threads.
  g_name_scratch = utf8 ? utf8 : "";
  Py_DECREF(names);
  return g_name_scratch.c_str();
}

int rten_model_input_count(void *h) { return name_count(h, "input_names"); }
int rten_model_output_count(void *h) { return name_count(h, "output_names"); }
const char *rten_model_input_name(void *h, int i) { return name_at(h, "input_names", i); }
const char *rten_model_output_name(void *h, int i) { return name_at(h, "output_names", i); }

void *rten_tensor_f32(const float *data, const int *shape, int ndim) {
  Gil gil;
  PyObject *arr = make_array(data, shape, ndim, "float32", 4);
  if (!arr) {
    set_error_from_python();
    return nullptr;
  }
  Tensor *t = new Tensor();
  t->array = arr;
  return t;
}

void *rten_tensor_i32(const int *data, const int *shape, int ndim) {
  Gil gil;
  PyObject *arr = make_array(data, shape, ndim, "int32", 4);
  if (!arr) {
    set_error_from_python();
    return nullptr;
  }
  Tensor *t = new Tensor();
  t->array = arr;
  return t;
}

int rten_tensor_ndim(void *handle) {
  Gil gil;
  Tensor *t = static_cast<Tensor *>(handle);
  PyObject *shape = PyObject_GetAttrString(t->array, "shape");
  int n = static_cast<int>(PyTuple_Size(shape));
  Py_DECREF(shape);
  return n;
}

void rten_tensor_shape(void *handle, int *out) {
  Gil gil;
  Tensor *t = static_cast<Tensor *>(handle);
  PyObject *shape = PyObject_GetAttrString(t->array, "shape");
  for (int i = 0; i < PyTuple_Size(shape); ++i)
    out[i] = static_cast<int>(PyLong_AsLong(PyTuple_GetItem(shape, i)));
  Py_DECREF(shape);
}

const float *rten_tensor_data_f32(void *handle) {
  Gil gil;
  Tensor *t = static_cast<Tensor *>(handle);
  if (!t->acquire_view()) return nullptr;
  if (!t->view.format || strcmp(t->view.format, "f") != 0) {
    g_error = "tensor is not float32";
    return nullptr;
  }
  return static_cast<const float *>(t->view.buf);
}

const int *rten_tensor_data_i32(void *handle) {
  Gil gil;
  Tensor *t = static_cast<Tensor *>(handle);
  if (!t->acquire_view()) return nullptr;
  if (!t->view.format || strcmp(t->view.format, "i") != 0) {
    g_error = "tensor is not int32";
    return nullptr;
  }
  return static_cast<const int *>(t->view.buf);
}

void rten_tensor_free(void *handle) { delete static_cast<Tensor *>(handle); }

// Run the model on ``n_in`` input tensors (positional, matching the graph's
// declared inputs). Fills up to ``max_out`` output tensor handles; returns
// the number of outputs, or -1 (see rten_last_error).
int rten_model_run(void *handle, void *const *inputs, int n_in, void **outputs,
                   int max_out) {
  Gil gil;
  Model *m = static_cast<Model *>(handle);
  PyObject *in_list = PyList_New(n_in);
  for (int i = 0; i < n_in; ++i) {
    Tensor *t = static_cast<Tensor *>(inputs[i]);
    Py_INCREF(t->array);
    PyList_SET_ITEM(in_list, i, t->array);
  }
  PyObject *outs = PyObject_CallMethod(m->model, "run", "O", in_list);
  Py_DECREF(in_list);
  if (!outs) {
    set_error_from_python();
    return -1;
  }
  PyObject *np = np_module();
  int n_out = static_cast<int>(PyList_Size(outs));
  int produced = 0;
  for (int i = 0; i < n_out && i < max_out; ++i) {
    PyObject *item = PyList_GetItem(outs, i);  // borrowed (may be jax array)
    PyObject *arr = PyObject_CallMethod(np, "ascontiguousarray", "O", item);
    if (!arr) {
      set_error_from_python();
      Py_DECREF(outs);
      return -1;
    }
    Tensor *t = new Tensor();
    t->array = arr;
    outputs[produced++] = t;
  }
  Py_DECREF(outs);
  return produced;
}

}  // extern "C"
