// Native interval algebra for pb_chime5_tpu.utils.array_interval.
//
// The reference accelerates the same four operations with Cython
// (pb_chime5/utils/intervall_array_util.pyx); here they are a plain
// CPython C++ extension.  Intervals are tuples of (start, stop) int
// pairs; all functions return new tuples.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <string>
#include <vector>

namespace {

using Interval = std::pair<int64_t, int64_t>;

bool parse_pair(PyObject* obj, Interval* out) {
  PyObject* fast = PySequence_Fast(obj, "interval must be a (start, stop) pair");
  if (fast == nullptr) return false;
  if (PySequence_Fast_GET_SIZE(fast) != 2) {
    Py_DECREF(fast);
    PyErr_SetString(PyExc_ValueError, "interval must have exactly 2 items");
    return false;
  }
  int64_t s = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fast, 0));
  int64_t e = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fast, 1));
  Py_DECREF(fast);
  if (PyErr_Occurred()) return false;
  *out = {s, e};
  return true;
}

bool parse_intervals(PyObject* obj, std::vector<Interval>* out) {
  PyObject* fast = PySequence_Fast(obj, "intervals must be a sequence");
  if (fast == nullptr) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->reserve(static_cast<size_t>(n));
  for (Py_ssize_t i = 0; i < n; ++i) {
    Interval iv;
    if (!parse_pair(PySequence_Fast_GET_ITEM(fast, i), &iv)) {
      Py_DECREF(fast);
      return false;
    }
    out->push_back(iv);
  }
  Py_DECREF(fast);
  return true;
}

PyObject* build_intervals(const std::vector<Interval>& ivs) {
  PyObject* tuple = PyTuple_New(static_cast<Py_ssize_t>(ivs.size()));
  if (tuple == nullptr) return nullptr;
  for (size_t i = 0; i < ivs.size(); ++i) {
    PyObject* pair = Py_BuildValue("(LL)", ivs[i].first, ivs[i].second);
    if (pair == nullptr) {
      Py_DECREF(tuple);
      return nullptr;
    }
    PyTuple_SET_ITEM(tuple, static_cast<Py_ssize_t>(i), pair);
  }
  return tuple;
}

PyObject* intersection(PyObject*, PyObject* args) {
  PyObject *interval_obj, *intervals_obj;
  if (!PyArg_ParseTuple(args, "OO", &interval_obj, &intervals_obj))
    return nullptr;
  Interval iv;
  std::vector<Interval> ivs;
  if (!parse_pair(interval_obj, &iv) || !parse_intervals(intervals_obj, &ivs))
    return nullptr;
  std::vector<Interval> out;
  for (const auto& [s0, e0] : ivs) {
    int64_t s = std::max(iv.first, s0);
    int64_t e = std::min(iv.second, e0);
    if (s < e) out.emplace_back(s, e);
  }
  return build_intervals(out);
}

PyObject* non_intersection(PyObject*, PyObject* args) {
  PyObject *interval_obj, *intervals_obj;
  if (!PyArg_ParseTuple(args, "OO", &interval_obj, &intervals_obj))
    return nullptr;
  Interval iv;
  std::vector<Interval> ivs;
  if (!parse_pair(interval_obj, &iv) || !parse_intervals(intervals_obj, &ivs))
    return nullptr;
  // Half-open set subtraction: remove [start, end) from every interval.
  const int64_t start = iv.first, end = iv.second;
  std::vector<Interval> out;
  for (const auto& [s, e] : ivs) {
    if (e <= start || s >= end) {  // disjoint
      out.emplace_back(s, e);
      continue;
    }
    if (s < start) out.emplace_back(s, start);  // left remainder
    if (e > end) out.emplace_back(end, e);      // right remainder
  }
  return build_intervals(out);
}

PyObject* normalize(PyObject*, PyObject* args) {
  PyObject* intervals_obj;
  if (!PyArg_ParseTuple(args, "O", &intervals_obj)) return nullptr;
  std::vector<Interval> ivs;
  if (!parse_intervals(intervals_obj, &ivs)) return nullptr;
  std::vector<Interval> valid;
  valid.reserve(ivs.size());
  for (const auto& p : ivs)
    if (p.first < p.second) valid.push_back(p);
  std::sort(valid.begin(), valid.end());
  std::vector<Interval> out;
  for (const auto& [s, e] : valid) {
    if (!out.empty() && s <= out.back().second) {
      out.back().second = std::max(out.back().second, e);
    } else {
      out.emplace_back(s, e);
    }
  }
  return build_intervals(out);
}

PyObject* str_to_intervals(PyObject*, PyObject* args) {
  const char* cstr;
  if (!PyArg_ParseTuple(args, "s", &cstr)) return nullptr;
  std::string s;
  for (const char* p = cstr; *p; ++p)
    if (*p != ' ') s.push_back(*p);
  // strip trailing commas
  while (!s.empty() && s.back() == ',') s.pop_back();
  std::vector<Interval> out;
  size_t pos = 0;
  while (pos < s.size()) {
    size_t comma = s.find(',', pos);
    if (comma == std::string::npos) comma = s.size();
    size_t colon = s.find(':', pos);
    if (colon == std::string::npos || colon >= comma) {
      PyErr_Format(PyExc_ValueError, "bad interval token in %s", cstr);
      return nullptr;
    }
    try {
      int64_t a = std::stoll(s.substr(pos, colon - pos));
      int64_t b = std::stoll(s.substr(colon + 1, comma - colon - 1));
      out.emplace_back(a, b);
    } catch (const std::exception&) {
      PyErr_Format(PyExc_ValueError, "bad interval token in %s", cstr);
      return nullptr;
    }
    pos = comma + 1;
  }
  return build_intervals(out);
}

PyMethodDef methods[] = {
    {"intersection", intersection, METH_VARARGS,
     "intersection((start, stop), intervals) -> tuple of intervals"},
    {"non_intersection", non_intersection, METH_VARARGS,
     "non_intersection((start, stop), intervals) -> tuple of intervals"},
    {"normalize", normalize, METH_VARARGS,
     "normalize(intervals) -> sorted, merged tuple of intervals"},
    {"str_to_intervals", str_to_intervals, METH_VARARGS,
     "str_to_intervals('1:4, 5:20') -> ((1, 4), (5, 20))"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_interval_ops",
    "Native interval algebra for ArrayInterval.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__interval_ops() { return PyModule_Create(&module); }
