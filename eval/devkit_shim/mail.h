// Minimal stand-in for the KITTI devkit's mail.h (console-only).
// Lets the unmodified devkit evaluate_object*.cpp compile in this image for
// differential testing; never sends mail.
#ifndef MAIL_H
#define MAIL_H

#include <cstdarg>
#include <cstdio>
#include <string>

class Mail {
 public:
  explicit Mail(const std::string& = "") {}
  void msg(const char* fmt, ...) {
    va_list args;
    va_start(args, fmt);
    vprintf(fmt, args);
    va_end(args);
    printf("\n");
  }
};

#endif  // MAIL_H
