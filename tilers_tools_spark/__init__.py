"""tilers_tools_spark — from-scratch PySpark-native tiling + spatial-join
engine with the capabilities of vss-devel/tilers-tools (see SURVEY.md)."""
__version__ = "0.1.0"
