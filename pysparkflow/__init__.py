"""pysparkflow — a PySpark-native analytics engine with the capabilities of
felix-halim/maxflow-mapreduce (iterative max-flow + BFS on small-world graphs),
plus a relational query surface and LLM-data-pipeline operators, all designed
for 100 TB scale.

Layout (SURVEY.md §7.1):
  io/          readers: DIMACS, adjacency TSV, edge-list parquet/csv
  graph/       Graph abstraction: symmetrize, capacities, super-nodes, degrees
  engine/      round loop machinery: frontier ops, driver-side acceptor, metrics
  algo/        max_flow(), bfs(), connected_components()
  relational/  driver-contract query surface (queries()/oracle_sql())
  llmops/      dedup, similarity search, text analysis, multimodal plumbing
  streaming/   Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
