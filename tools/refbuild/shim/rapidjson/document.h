/* Minimal rapidjson-API-compatible JSON reader for the refbuild shim.
 *
 * Implements exactly the subset the reference's c_experiment.cpp uses
 * (medgpc/src/dataio/c_experiment.cpp:53-155): IStreamWrapper over an
 * ifstream, Document::ParseStream, operator[](const char*) and the
 * Value accessors IsString/IsInt/IsFloat/IsDouble/GetString/GetInt/
 * GetFloat/GetDouble.  Full recursive-descent JSON parse (objects,
 * arrays, strings with escapes, numbers, true/false/null) so any valid
 * exp_setup.json round-trips.  Not rapidjson code — a from-scratch
 * ~150-line parser with a name-compatible surface.
 */
#ifndef MEDGP_REFBUILD_RAPIDJSON_DOCUMENT_H
#define MEDGP_REFBUILD_RAPIDJSON_DOCUMENT_H

#include <cassert> /* real rapidjson exposes assert transitively;
                      c_experiment.cpp depends on that */
#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <string>
#include <vector>

namespace rapidjson {

class Value {
 public:
  enum Kind { kNull, kBool, kNumber, kString, kObject, kArray };
  Kind kind = kNull;
  bool bval = false;
  double num = 0.0;
  bool num_is_integral = false;
  std::string str;
  std::map<std::string, Value> members;
  std::vector<Value> elements;

  bool IsNull() const { return kind == kNull; }
  bool IsBool() const { return kind == kBool; }
  bool IsString() const { return kind == kString; }
  bool IsObject() const { return kind == kObject; }
  bool IsArray() const { return kind == kArray; }
  bool IsNumber() const { return kind == kNumber; }
  bool IsInt() const { return kind == kNumber && num_is_integral; }
  /* rapidjson's IsFloat/IsDouble are true for any number losslessly
   * representable in that type; the config values all qualify */
  bool IsFloat() const { return kind == kNumber; }
  bool IsDouble() const { return kind == kNumber; }

  const char *GetString() const { return str.c_str(); }
  int GetInt() const { return static_cast<int>(num); }
  float GetFloat() const { return static_cast<float>(num); }
  double GetDouble() const { return num; }
  bool GetBool() const { return bval; }
  size_t Size() const { return elements.size(); }

  bool HasMember(const char *name) const {
    return members.count(name) != 0;
  }
  const Value &operator[](const char *name) const {
    std::map<std::string, Value>::const_iterator it = members.find(name);
    if (it == members.end()) {
      std::fprintf(stderr, "json: missing key '%s'\n", name);
      std::abort();
    }
    return it->second;
  }
  const Value &operator[](size_t i) const { return elements[i]; }
};

namespace detail {

struct Parser {
  const std::string &s;
  size_t p = 0;
  bool ok = true;
  explicit Parser(const std::string &text) : s(text) {}

  void skip_ws() {
    while (p < s.size() && std::isspace(static_cast<unsigned char>(s[p])))
      ++p;
  }
  bool consume(char c) {
    skip_ws();
    if (p < s.size() && s[p] == c) {
      ++p;
      return true;
    }
    return false;
  }
  void fail() { ok = false; }

  bool parse_string(std::string &out) {
    skip_ws();
    if (p >= s.size() || s[p] != '"') return false;
    ++p;
    out.clear();
    while (p < s.size() && s[p] != '"') {
      char c = s[p++];
      if (c == '\\' && p < s.size()) {
        char e = s[p++];
        switch (e) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            /* config files are ASCII; decode BMP escapes naively */
            if (p + 4 <= s.size()) {
              unsigned code = static_cast<unsigned>(
                  std::strtoul(s.substr(p, 4).c_str(), nullptr, 16));
              p += 4;
              if (code < 0x80) out += static_cast<char>(code);
            }
            break;
          }
          default: out += e;
        }
      } else {
        out += c;
      }
    }
    if (p >= s.size()) return false;
    ++p; /* closing quote */
    return true;
  }

  void parse_value(Value &v) {
    skip_ws();
    if (p >= s.size()) return fail();
    char c = s[p];
    if (c == '{') {
      ++p;
      v.kind = Value::kObject;
      skip_ws();
      if (consume('}')) return;
      while (ok) {
        std::string key;
        if (!parse_string(key)) return fail();
        if (!consume(':')) return fail();
        parse_value(v.members[key]);
        if (consume('}')) return;
        if (!consume(',')) return fail();
      }
    } else if (c == '[') {
      ++p;
      v.kind = Value::kArray;
      skip_ws();
      if (consume(']')) return;
      while (ok) {
        v.elements.push_back(Value());
        parse_value(v.elements.back());
        if (consume(']')) return;
        if (!consume(',')) return fail();
      }
    } else if (c == '"') {
      v.kind = Value::kString;
      if (!parse_string(v.str)) return fail();
    } else if (std::isdigit(static_cast<unsigned char>(c)) || c == '-' ||
               c == '+') {
      size_t start = p;
      while (p < s.size() &&
             (std::isdigit(static_cast<unsigned char>(s[p])) ||
              s[p] == '-' || s[p] == '+' || s[p] == '.' || s[p] == 'e' ||
              s[p] == 'E'))
        ++p;
      std::string tok = s.substr(start, p - start);
      char *end = nullptr;
      v.kind = Value::kNumber;
      v.num = std::strtod(tok.c_str(), &end);
      if (end == tok.c_str()) return fail();
      v.num_is_integral =
          tok.find('.') == std::string::npos &&
          tok.find('e') == std::string::npos &&
          tok.find('E') == std::string::npos && std::fabs(v.num) < 2.1e9;
    } else if (s.compare(p, 4, "true") == 0) {
      p += 4;
      v.kind = Value::kBool;
      v.bval = true;
    } else if (s.compare(p, 5, "false") == 0) {
      p += 5;
      v.kind = Value::kBool;
      v.bval = false;
    } else if (s.compare(p, 4, "null") == 0) {
      p += 4;
      v.kind = Value::kNull;
    } else {
      fail();
    }
  }
};

}  // namespace detail

class Document : public Value {
 public:
  template <typename Stream>
  Document &ParseStream(Stream &stream) {
    std::string text = stream.slurp();
    detail::Parser parser(text);
    parser.parse_value(*this);
    if (!parser.ok) {
      std::fprintf(stderr, "json: parse error at byte %zu\n", parser.p);
      std::abort();
    }
    return *this;
  }
};

}  // namespace rapidjson

#endif /* MEDGP_REFBUILD_RAPIDJSON_DOCUMENT_H */
