"""Column-expression libraries (JVM-side, codegen-friendly)."""
