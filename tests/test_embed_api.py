"""In-process C embedding API (librten_embed.so).

The reference exposes an in-process embedding surface for another language
(wasm-bindgen JS API, /root/reference/src/wasm_api.rs:15-211 + index.js);
the TPU-era analog is a C ABI over the same Model surface. This test writes
a REAL C program, compiles it with g++, links it against librten_embed.so,
and has it load a .rten model from disk and run it — no Python on the
caller's side.
"""

import os
import subprocess

import numpy as np
import pytest

from rten_tpu.graph import Graph
from rten_tpu.format.rten_io import save_rten

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

C_DRIVER = r"""
#include <stdio.h>
#include <stdlib.h>

/* librten_embed.so ABI */
#ifdef __cplusplus
extern "C" {
#endif
extern int rten_init(const char *python_path);
extern const char *rten_last_error(void);
extern void *rten_model_load_file(const char *path);
extern int rten_model_input_count(void *m);
extern int rten_model_output_count(void *m);
extern const char *rten_model_input_name(void *m, int i);
extern void *rten_tensor_f32(const float *data, const int *shape, int ndim);
extern int rten_model_run(void *m, void *const *in, int n_in, void **out, int max_out);
extern int rten_tensor_ndim(void *t);
extern void rten_tensor_shape(void *t, int *out);
extern const float *rten_tensor_data_f32(void *t);
extern void rten_tensor_free(void *t);
extern void rten_model_free(void *m);
#ifdef __cplusplus
}
#endif

int main(int argc, char **argv) {
  if (rten_init(argv[2]) != 0) {
    fprintf(stderr, "init failed: %s\n", rten_last_error());
    return 1;
  }
  void *model = rten_model_load_file(argv[1]);
  if (!model) {
    fprintf(stderr, "load failed: %s\n", rten_last_error());
    return 1;
  }
  printf("inputs=%d outputs=%d first_input=%s\n",
         rten_model_input_count(model), rten_model_output_count(model),
         rten_model_input_name(model, 0));

  float data[8];
  for (int i = 0; i < 8; ++i) data[i] = (float)i - 3.0f;
  int shape[2] = {2, 4};
  void *x = rten_tensor_f32(data, shape, 2);
  void *outs[4];
  int n = rten_model_run(model, &x, 1, outs, 4);
  if (n < 0) {
    fprintf(stderr, "run failed: %s\n", rten_last_error());
    return 1;
  }
  int oshape[8];
  int nd = rten_tensor_ndim(outs[0]);
  rten_tensor_shape(outs[0], oshape);
  const float *od = rten_tensor_data_f32(outs[0]);
  printf("n_out=%d ndim=%d shape=%d,%d\n", n, nd, oshape[0], oshape[1]);
  long total = 1;
  for (int i = 0; i < nd; ++i) total *= oshape[i];
  for (long i = 0; i < total; ++i) printf("%.4f ", od[i]);
  printf("\n");
  rten_tensor_free(x);
  rten_tensor_free(outs[0]);
  rten_model_free(model);
  return 0;
}
"""


@pytest.mark.slow
def test_c_program_embeds_and_runs_model(tmp_path):
    from rten_tpu.native.build import build_embed

    lib = build_embed()
    if lib is None:
        pytest.skip("g++/python headers unavailable")

    # Model: relu(x @ w) + 1 over a [2, 4] input.
    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("x", [2, 4])
    wv = rng.standard_normal((4, 3)).astype(np.float32)
    w = g.add_constant("w", wv)
    mm = g.add_simple_op("MatMul", [x, w], name="mm")
    r = g.add_simple_op("Relu", [mm], name="relu")
    one = g.add_constant("one", np.float32(1.0))
    out = g.add_simple_op("Add", [r, one], name="plus1")
    g.inputs, g.outputs = [x], [out]
    model_path = tmp_path / "embed_test.rten"
    model_path.write_bytes(save_rten(g))

    src = tmp_path / "driver.c"
    src.write_text(C_DRIVER)
    exe = tmp_path / "driver"
    subprocess.run(
        ["g++", "-o", str(exe), str(src), str(lib), f"-Wl,-rpath,{os.path.dirname(lib)}"],
        check=True, capture_output=True, text=True,
    )

    env = dict(os.environ)
    # Force CPU inside the embedded interpreter (tunnel contention + speed).
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [str(exe), str(model_path), REPO],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.strip().splitlines()
    assert lines[0] == "inputs=1 outputs=1 first_input=x"
    assert lines[1] == "n_out=1 ndim=2 shape=2,3"

    xv = (np.arange(8, dtype=np.float32) - 3.0).reshape(2, 4)
    expected = np.maximum(xv @ wv, 0) + 1.0
    got = np.asarray([float(v) for v in lines[2].split()]).reshape(2, 3)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
