/* Fast COCO RLE codec (CPython extension).
 *
 * Native replacement for the pycocotools C maskUtils the reference relies
 * on for mask ground truth + mask IoU (SURVEY.md §2.9) — the varint
 * codec and run-length scan are byte-level loops that numpy cannot
 * vectorise well.  simvg_tpu/ops/rle.py uses this when built
 * (simvg_tpu/native/build.py) and falls back to numpy otherwise; both
 * implement the identical format, cross-checked in tests/test_rle.py.
 *
 * Format: column-major binary mask -> run lengths starting with a run of
 * zeros -> difference coding from the 3rd run -> base-6 varint chars
 * (0x30 + 6 bits, continuation bit 0x20, sign bit 0x10 on the last
 * chunk), identical to pycocotools.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---- counts -> varint bytes ---- */
static PyObject *encode_counts(PyObject *self, PyObject *args) {
    PyObject *seq;
    if (!PyArg_ParseTuple(args, "O", &seq)) return NULL;
    PyObject *fast = PySequence_Fast(seq, "counts must be a sequence");
    if (!fast) return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    /* worst case ~13 chars per 64-bit count */
    char *buf = (char *)malloc((size_t)n * 13 + 1);
    if (!buf) { Py_DECREF(fast); return PyErr_NoMemory(); }
    size_t m = 0;
    int64_t prev2 = 0, prev1 = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        int64_t x = PyLong_AsLongLong(
            PySequence_Fast_GET_ITEM(fast, i));
        if (x == -1 && PyErr_Occurred()) { free(buf); Py_DECREF(fast);
            return NULL; }
        int64_t orig = x;
        if (i > 2) x -= prev2;
        prev2 = prev1; prev1 = orig;
        int more = 1;
        while (more) {
            int64_t bits = x & 0x1f;
            x >>= 5;
            more = !((x == 0 && !(bits & 0x10)) ||
                     (x == -1 && (bits & 0x10)));
            if (more) bits |= 0x20;
            buf[m++] = (char)(bits + 48);
        }
    }
    Py_DECREF(fast);
    PyObject *out = PyBytes_FromStringAndSize(buf, (Py_ssize_t)m);
    free(buf);
    return out;
}

/* ---- varint bytes -> counts list ---- */
static PyObject *decode_counts(PyObject *self, PyObject *args) {
    const char *s; Py_ssize_t n;
    if (!PyArg_ParseTuple(args, "y#", &s, &n)) return NULL;
    PyObject *list = PyList_New(0);
    if (!list) return NULL;
    Py_ssize_t i = 0;
    int64_t prev2 = 0, prev1 = 0;
    Py_ssize_t cnt = 0;
    while (i < n) {
        int64_t x = 0;
        int k = 0, more = 1;
        int64_t c = 0;
        while (more) {
            if (i >= n) { Py_DECREF(list);
                PyErr_SetString(PyExc_ValueError, "truncated RLE");
                return NULL; }
            c = (int64_t)(s[i] - 48);
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            i++; k++;
        }
        if (c & 0x10) x |= -(1ll << (5 * k));
        if (cnt > 2) x += prev2;
        prev2 = prev1; prev1 = x;
        cnt++;
        PyObject *v = PyLong_FromLongLong(x);
        if (!v || PyList_Append(list, v) < 0) {
            Py_XDECREF(v); Py_DECREF(list); return NULL; }
        Py_DECREF(v);
    }
    return list;
}

/* ---- binary buffer (F-order flat) -> run lengths ---- */
static PyObject *runs_from_mask(PyObject *self, PyObject *args) {
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
    const uint8_t *p = (const uint8_t *)view.buf;
    Py_ssize_t n = view.len;
    PyObject *list = PyList_New(0);
    if (!list) { PyBuffer_Release(&view); return NULL; }
    uint8_t cur = 0;
    int64_t run = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        uint8_t v = p[i] ? 1 : 0;
        if (v == cur) { run++; }
        else {
            PyObject *o = PyLong_FromLongLong(run);
            if (!o || PyList_Append(list, o) < 0) {
                Py_XDECREF(o); Py_DECREF(list);
                PyBuffer_Release(&view); return NULL; }
            Py_DECREF(o);
            cur = v; run = 1;
        }
    }
    PyObject *o = PyLong_FromLongLong(run);
    if (!o || PyList_Append(list, o) < 0) {
        Py_XDECREF(o); Py_DECREF(list);
        PyBuffer_Release(&view); return NULL; }
    Py_DECREF(o);
    PyBuffer_Release(&view);
    if (n == 0) { Py_DECREF(list); return PyList_New(0); }
    return list;
}

/* ---- run lengths -> binary buffer ---- */
static PyObject *mask_from_runs(PyObject *self, PyObject *args) {
    PyObject *seq; Py_ssize_t total;
    if (!PyArg_ParseTuple(args, "On", &seq, &total)) return NULL;
    PyObject *fast = PySequence_Fast(seq, "runs must be a sequence");
    if (!fast) return NULL;
    PyObject *bytes = PyBytes_FromStringAndSize(NULL, total);
    if (!bytes) { Py_DECREF(fast); return NULL; }
    uint8_t *out = (uint8_t *)PyBytes_AS_STRING(bytes);
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    Py_ssize_t pos = 0;
    uint8_t val = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        int64_t run = PyLong_AsLongLong(
            PySequence_Fast_GET_ITEM(fast, i));
        if (run == -1 && PyErr_Occurred()) goto fail;
        /* run > total - pos: avoids signed overflow of pos + run
           when a hostile varint decodes near INT64_MAX (pos <= total
           invariant holds throughout) */
        if (run < 0 || run > total - pos) {
            PyErr_SetString(PyExc_ValueError, "runs overflow mask size");
            goto fail;
        }
        memset(out + pos, val, (size_t)run);
        pos += run;
        val = 1 - val;
    }
    if (pos != total) {
        PyErr_SetString(PyExc_ValueError, "runs do not cover mask");
        goto fail;
    }
    Py_DECREF(fast);
    return bytes;
fail:
    Py_DECREF(fast);
    Py_DECREF(bytes);
    return NULL;
}

static PyMethodDef Methods[] = {
    {"encode_counts", encode_counts, METH_VARARGS,
     "run-length counts -> COCO varint bytes"},
    {"decode_counts", decode_counts, METH_VARARGS,
     "COCO varint bytes -> run-length counts"},
    {"runs_from_mask", runs_from_mask, METH_VARARGS,
     "flat binary buffer -> run lengths (starting with a 0-run)"},
    {"mask_from_runs", mask_from_runs, METH_VARARGS,
     "run lengths -> flat binary buffer"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_rle", "fast COCO RLE codec", -1, Methods
};

PyMODINIT_FUNC PyInit__rle(void) { return PyModule_Create(&moduledef); }
