// Native MPS-format reader for linprog_tpu.
//
// Host-side data loading belongs in native code: parsing large MPS files in
// Python is 20-50x slower and the parse cost would serialize in front of
// device work.  This is a self-contained C++17 parser for the common MPS
// subset (free-format tokenization):
//
//   NAME, ROWS (N/L/G/E), COLUMNS (incl. integrality markers, ignored),
//   RHS, RANGES, BOUNDS (UP/LO/FX/FR/MI/PL/BV), OBJSENSE, ENDATA.
//
// Exposed through a minimal C ABI consumed via ctypes
// (see linprog_tpu/io/mps.py).  Entries are returned in COO form; the
// Python side densifies straight into the solver's canonical inputs.

#include <cctype>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <limits>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Entry {
  int row;  // -1 == objective row
  int col;
  double val;
};

struct Problem {
  std::string name;
  bool maximize = false;
  std::vector<char> row_types;  // 'L', 'G', 'E' per constraint row
  std::vector<std::string> row_names;
  std::vector<std::string> col_names;
  std::vector<double> rhs;     // per constraint row
  std::vector<double> range_;  // per constraint row (NaN if unset)
  std::vector<double> obj;     // per column
  std::vector<double> lb, ub;  // per column
  std::vector<Entry> entries;  // constraint-matrix entries only
  int int_markers = 0;  // count of 'MARKER' INTORG sections (LP relaxation!)
  std::string error;
};

std::vector<std::string> tokenize(const std::string& line) {
  std::vector<std::string> out;
  std::istringstream ss(line);
  std::string tok;
  while (ss >> tok) out.push_back(tok);
  return out;
}

bool parse_file(const std::string& path, Problem& p) {
  std::ifstream in(path);
  if (!in) {
    p.error = "cannot open file: " + path;
    return false;
  }
  enum Section { NONE, ROWS, COLUMNS, RHS, RANGES, BOUNDS, OBJSENSE, DONE };
  Section sec = NONE;
  std::unordered_map<std::string, int> row_idx;   // constraint rows
  std::unordered_map<std::string, int> col_idx;
  std::string obj_row_name;
  std::string line;
  int lineno = 0;

  auto col_of = [&](const std::string& name) {
    auto it = col_idx.find(name);
    if (it != col_idx.end()) return it->second;
    int id = static_cast<int>(p.col_names.size());
    col_idx.emplace(name, id);
    p.col_names.push_back(name);
    p.obj.push_back(0.0);
    p.lb.push_back(0.0);
    p.ub.push_back(kInf);
    return id;
  };

  while (std::getline(in, line)) {
    ++lineno;
    if (line.empty()) continue;
    if (line[0] == '*') continue;  // comment
    bool indented = std::isspace(static_cast<unsigned char>(line[0])) != 0;
    auto toks = tokenize(line);
    if (toks.empty()) continue;

    if (!indented) {  // section header
      const std::string& head = toks[0];
      if (head == "NAME") {
        if (toks.size() > 1) p.name = toks[1];
        continue;
      }
      if (head == "ROWS") { sec = ROWS; continue; }
      if (head == "COLUMNS") { sec = COLUMNS; continue; }
      if (head == "RHS") { sec = RHS; continue; }
      if (head == "RANGES") { sec = RANGES; continue; }
      if (head == "BOUNDS") { sec = BOUNDS; continue; }
      if (head == "OBJSENSE") { sec = OBJSENSE; continue; }
      if (head == "ENDATA") { sec = DONE; break; }
      p.error = "unknown section '" + head + "' at line " +
                std::to_string(lineno);
      return false;
    }

    switch (sec) {
      case OBJSENSE: {
        if (!toks.empty()) {
          std::string s = toks[0];
          for (auto& ch : s) ch = static_cast<char>(std::toupper(ch));
          p.maximize = (s == "MAX" || s == "MAXIMIZE");
        }
        break;
      }
      case ROWS: {
        if (toks.size() < 2) break;
        char t = static_cast<char>(std::toupper(toks[0][0]));
        const std::string& rname = toks[1];
        if (t == 'N') {
          if (obj_row_name.empty()) obj_row_name = rname;
          // extra free rows are ignored
        } else if (t == 'L' || t == 'G' || t == 'E') {
          int id = static_cast<int>(p.row_names.size());
          row_idx.emplace(rname, id);
          p.row_names.push_back(rname);
          p.row_types.push_back(t);
          p.rhs.push_back(0.0);
          p.range_.push_back(std::numeric_limits<double>::quiet_NaN());
        } else {
          p.error = "bad row type at line " + std::to_string(lineno);
          return false;
        }
        break;
      }
      case COLUMNS: {
        // integrality markers: "<name> 'MARKER' 'INTORG'/'INTEND'" --
        // counted so callers can warn that they solve the LP RELAXATION
        if (toks.size() >= 3 && toks[1] == "'MARKER'") {
          if (toks[2] == "'INTORG'") p.int_markers++;
          break;
        }
        if (toks.size() < 3) break;
        int col = col_of(toks[0]);
        for (size_t i = 1; i + 1 < toks.size(); i += 2) {
          const std::string& rname = toks[i];
          double val = std::stod(toks[i + 1]);
          if (rname == obj_row_name) {
            p.obj[col] = val;
          } else {
            auto it = row_idx.find(rname);
            if (it == row_idx.end()) {
              p.error = "unknown row '" + rname + "' at line " +
                        std::to_string(lineno);
              return false;
            }
            p.entries.push_back({it->second, col, val});
          }
        }
        break;
      }
      case RHS: {
        if (toks.size() < 3) break;
        for (size_t i = 1; i + 1 < toks.size(); i += 2) {
          const std::string& rname = toks[i];
          double val = std::stod(toks[i + 1]);
          if (rname == obj_row_name) continue;  // objective offset ignored
          auto it = row_idx.find(rname);
          if (it != row_idx.end()) p.rhs[it->second] = val;
        }
        break;
      }
      case RANGES: {
        if (toks.size() < 3) break;
        for (size_t i = 1; i + 1 < toks.size(); i += 2) {
          auto it = row_idx.find(toks[i]);
          if (it != row_idx.end()) p.range_[it->second] = std::stod(toks[i + 1]);
        }
        break;
      }
      case BOUNDS: {
        if (toks.size() < 3) break;
        std::string btype = toks[0];
        for (auto& ch : btype) ch = static_cast<char>(std::toupper(ch));
        int col = col_of(toks[2]);
        double val = (toks.size() >= 4) ? std::stod(toks[3]) : 0.0;
        if (btype == "UP") p.ub[col] = val;
        else if (btype == "LO") p.lb[col] = val;
        else if (btype == "FX") { p.lb[col] = val; p.ub[col] = val; }
        else if (btype == "FR") { p.lb[col] = -kInf; p.ub[col] = kInf; }
        else if (btype == "MI") p.lb[col] = -kInf;
        else if (btype == "PL") p.ub[col] = kInf;
        else if (btype == "BV") { p.lb[col] = 0.0; p.ub[col] = 1.0; }
        else {
          p.error = "unsupported bound type '" + btype + "' at line " +
                    std::to_string(lineno);
          return false;
        }
        break;
      }
      default:
        break;
    }
  }
  if (p.col_names.empty()) {
    p.error = "no columns parsed";
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

void* mps_open(const char* path, char* errbuf, int errlen) {
  auto* p = new Problem();
  bool ok = false;
  try {
    ok = parse_file(path, *p);
  } catch (const std::exception& e) {
    // malformed numeric tokens etc. (std::stod throws) must surface as a
    // parse error, not terminate the embedding process
    p->error = std::string("parse exception: ") + e.what();
    ok = false;
  }
  if (!ok) {
    if (errbuf && errlen > 0) {
      std::snprintf(errbuf, static_cast<size_t>(errlen), "%s",
                    p->error.c_str());
    }
    delete p;
    return nullptr;
  }
  return p;
}

int mps_num_integer_markers(void* h) {
  return static_cast<Problem*>(h)->int_markers;
}

int mps_num_rows(void* h) {
  return static_cast<int>(static_cast<Problem*>(h)->row_types.size());
}

int mps_num_cols(void* h) {
  return static_cast<int>(static_cast<Problem*>(h)->col_names.size());
}

int mps_num_entries(void* h) {
  return static_cast<int>(static_cast<Problem*>(h)->entries.size());
}

int mps_is_maximize(void* h) {
  return static_cast<Problem*>(h)->maximize ? 1 : 0;
}

const char* mps_problem_name(void* h) {
  return static_cast<Problem*>(h)->name.c_str();
}

// row_types: 'L'/'G'/'E' chars; rhs/ranges length m; c/lb/ub length n.
// ranges entries are NaN when unset.
void mps_get_structure(void* h, char* row_types, double* rhs, double* ranges,
                       double* c, double* lb, double* ub) {
  auto* p = static_cast<Problem*>(h);
  const size_t m = p->row_types.size(), n = p->col_names.size();
  std::memcpy(row_types, p->row_types.data(), m);
  std::memcpy(rhs, p->rhs.data(), m * sizeof(double));
  std::memcpy(ranges, p->range_.data(), m * sizeof(double));
  std::memcpy(c, p->obj.data(), n * sizeof(double));
  std::memcpy(lb, p->lb.data(), n * sizeof(double));
  std::memcpy(ub, p->ub.data(), n * sizeof(double));
}

void mps_get_entries(void* h, int* rows, int* cols, double* vals) {
  auto* p = static_cast<Problem*>(h);
  for (size_t i = 0; i < p->entries.size(); ++i) {
    rows[i] = p->entries[i].row;
    cols[i] = p->entries[i].col;
    vals[i] = p->entries[i].val;
  }
}

// copies the i-th name into buf (truncated to buflen-1)
void mps_row_name(void* h, int i, char* buf, int buflen) {
  auto* p = static_cast<Problem*>(h);
  std::snprintf(buf, static_cast<size_t>(buflen), "%s",
                p->row_names[static_cast<size_t>(i)].c_str());
}

void mps_col_name(void* h, int i, char* buf, int buflen) {
  auto* p = static_cast<Problem*>(h);
  std::snprintf(buf, static_cast<size_t>(buflen), "%s",
                p->col_names[static_cast<size_t>(i)].c_str());
}

void mps_close(void* h) { delete static_cast<Problem*>(h); }

}  // extern "C"
