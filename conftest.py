import sys
from pathlib import Path

# make the in-tree package importable without installation
sys.path.insert(0, str(Path(__file__).parent))
