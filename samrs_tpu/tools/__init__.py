"""Host-side utilities: statistics, visualization, pkl fixer, annotation
format converters, COCO JSON export.

Reference: GD/statistic.py, GD/visualize.py, GD/script.py, GD/ann_transform.py,
GD/instance_to_json.py.
"""
