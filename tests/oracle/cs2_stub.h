// Build stub: declarations only; the trans_prob CS2 path is never
// instantiated by solid_assembly, so no definitions are required.
#ifndef CS2_STUB_H
#define CS2_STUB_H
class CS2 {
 public:
  enum solution_code { optimal, infeasible, error };
  CS2(long unsigned int nnodes, long unsigned int narcs);
  void netflow_input_begin();
  void netflow(long unsigned int node, long signed int flow);
  void netflow_input_end();
  void arc_input_begin();
  void arc(long unsigned int from, long unsigned int to,
           long signed int lo, long signed int hi, long signed int cost);
  void arc_input_end();
  solution_code solve();
  double objective();
  long unsigned int narc();
  long unsigned int arcfrom(long unsigned int i);
  long unsigned int arcto(long unsigned int i);
  long signed int arcflow(long unsigned int i);
};
#endif
