#include "CS2.h"
#include <cstdlib>
CS2::CS2(long unsigned int, long unsigned int) { abort(); }
void CS2::netflow_input_begin() { abort(); }
void CS2::netflow(long unsigned int, long signed int) { abort(); }
void CS2::netflow_input_end() { abort(); }
void CS2::arc_input_begin() { abort(); }
void CS2::arc(long unsigned int, long unsigned int, long signed int, long signed int, long signed int) { abort(); }
void CS2::arc_input_end() { abort(); }
CS2::solution_code CS2::solve() { abort(); }
double CS2::objective() { abort(); }
long unsigned int CS2::narc() { abort(); }
long unsigned int CS2::arcfrom(long unsigned int) { abort(); }
long unsigned int CS2::arcto(long unsigned int) { abort(); }
long signed int CS2::arcflow(long unsigned int) { abort(); }
