/* Companion to the minimal rapidjson shim: IStreamWrapper just slurps
 * the stream; Document::ParseStream consumes the buffered text. */
#ifndef MEDGP_REFBUILD_RAPIDJSON_ISTREAMWRAPPER_H
#define MEDGP_REFBUILD_RAPIDJSON_ISTREAMWRAPPER_H

#include <istream>
#include <sstream>
#include <string>

namespace rapidjson {

class IStreamWrapper {
 public:
  explicit IStreamWrapper(std::istream &is) {
    std::ostringstream ss;
    ss << is.rdbuf();
    text_ = ss.str();
  }
  std::string slurp() const { return text_; }

 private:
  std::string text_;
};

}  // namespace rapidjson

#endif
