"""``python -m project_fauna_spark`` (reference: src/animals_etl/__main__.py)."""

from project_fauna_spark.cli import main

if __name__ == "__main__":
    main()
