"""End-user query surfaces: POS transform kernel + dashboard analytics."""
