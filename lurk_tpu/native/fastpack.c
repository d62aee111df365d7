/* fastpack: bulk python-int <-> 32-byte little-endian buffer conversion.
 *
 * The prover's host runtime moves witness vectors (~1M field elements
 * per fold step) between python bigints and the packed 4x64 buffers the
 * native MSM/R1CS kernels consume; int.to_bytes + join costs ~5s per
 * 920k-element pack, dominating warm proving. This CPython extension
 * does the same conversion through the C big-int API (~100x).
 *
 * Built on demand by lurk_tpu.native.fastpack (no pybind11; plain
 * CPython C API).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

/* CPython-private but exported big-int byte conversions (3.8..3.12). */
extern int _PyLong_AsByteArray(PyLongObject *v, unsigned char *bytes,
                               size_t n, int little_endian, int is_signed);
extern PyObject *_PyLong_FromByteArray(const unsigned char *bytes,
                                       size_t n, int little_endian,
                                       int is_signed);

static PyObject *
pack32(PyObject *self, PyObject *args)
{
    PyObject *seq;
    if (!PyArg_ParseTuple(args, "O", &seq))
        return NULL;
    PyObject *fast = PySequence_Fast(seq, "pack32 expects a sequence");
    if (!fast)
        return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 32);
    if (!out) {
        Py_DECREF(fast);
        return NULL;
    }
    unsigned char *buf = (unsigned char *)PyBytes_AS_STRING(out);
    PyObject **items = PySequence_Fast_ITEMS(fast);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *it = items[i];
        if (!PyLong_Check(it)) {
            Py_DECREF(fast);
            Py_DECREF(out);
            PyErr_SetString(PyExc_TypeError, "pack32: non-int element");
            return NULL;
        }
        if (_PyLong_AsByteArray((PyLongObject *)it, buf + 32 * i, 32,
                                /*little*/ 1, /*signed*/ 0) < 0) {
            Py_DECREF(fast);
            Py_DECREF(out);
            /* negative or >= 2^256: caller falls back to slow path */
            return NULL;
        }
    }
    Py_DECREF(fast);
    return out;
}

static PyObject *
unpack32(PyObject *self, PyObject *args)
{
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "y*", &view))
        return NULL;
    if (view.len % 32 != 0) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError,
                        "unpack32: length not a multiple of 32");
        return NULL;
    }
    Py_ssize_t n = view.len / 32;
    PyObject *out = PyList_New(n);
    if (!out) {
        PyBuffer_Release(&view);
        return NULL;
    }
    const unsigned char *buf = (const unsigned char *)view.buf;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = _PyLong_FromByteArray(buf + 32 * i, 32, 1, 0);
        if (!v) {
            Py_DECREF(out);
            PyBuffer_Release(&view);
            return NULL;
        }
        PyList_SET_ITEM(out, i, v);
    }
    PyBuffer_Release(&view);
    return out;
}

static PyMethodDef methods[] = {
    {"pack32", pack32, METH_VARARGS,
     "pack32(seq[int]) -> bytes: 32-byte LE each; ints must be in "
     "[0, 2^256)."},
    {"unpack32", unpack32, METH_VARARGS,
     "unpack32(buffer) -> list[int]: inverse of pack32."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "lurk_fastpack", NULL, -1, methods,
};

PyMODINIT_FUNC
PyInit_lurk_fastpack(void)
{
    return PyModule_Create(&moduledef);
}
