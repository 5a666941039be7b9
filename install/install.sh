#!/usr/bin/env bash
# av1tpu installer (ref: install.sh — system user, dirs, config, units).
# Usage: sudo ./install/install.sh [--prefix /opt/av1tpu]
set -euo pipefail

PREFIX=/opt/av1tpu
CONFIG_DIR=/etc/av1qsvd          # byte-compatible config path
DATA_DIR=/var/lib/av1tpu
while [[ $# -gt 0 ]]; do
  case "$1" in
    --prefix) PREFIX="$2"; shift 2;;
    *) echo "unknown arg $1"; exit 1;;
  esac
done

echo "== av1tpu install to $PREFIX =="

# 1. system user (install.sh:89-95 analog)
if ! id av1d &>/dev/null; then
  useradd --system --no-create-home --shell /usr/sbin/nologin av1d
  echo "created system user av1d"
fi

# 2. directories (install.sh:97-108)
mkdir -p "$PREFIX" "$CONFIG_DIR" "$DATA_DIR/jobs"
chown -R av1d:av1d "$DATA_DIR"

# 3. code
SRC_DIR="$(cd "$(dirname "$0")/.." && pwd)"
cp -r "$SRC_DIR/av1tpu" "$PREFIX/"
make -C "$PREFIX/av1tpu/encoder/entropy/native"

# 4. default config (install.sh:173-186) — reference key set + tpu keys
if [[ ! -f "$CONFIG_DIR/config.json" ]]; then
  cat > "$CONFIG_DIR/config.json" <<EOF
{
  "ffmpeg_url": "",
  "ffmpeg_install_dir": "",
  "library_roots": [],
  "min_bytes": 2147483648,
  "max_size_ratio": 0.90,
  "job_state_dir": "$DATA_DIR/jobs",
  "scan_interval_sec": 60,
  "encoder": "tpu",
  "tpu": {"keyint": 120, "num_chips": 0}
}
EOF
  echo "wrote default config to $CONFIG_DIR/config.json"
fi

# 5. systemd unit (install.sh:135-170).  ProtectSystem=strict blocks all
# writes outside ReadWritePaths, so the configured library roots MUST be
# listed or the daemon cannot create `<base>.av1-tmp.mkv` next to media
# files (reference unit includes them: install.sh:152-156).  Roots are
# read from the live config; rerun this installer after editing
# library_roots.
ROOTS=$(python3 - "$CONFIG_DIR/config.json" <<'PYEOF'
import json, sys
try:
    with open(sys.argv[1]) as f:
        print(" ".join(json.load(f).get("library_roots", [])))
except Exception:
    pass
PYEOF
)
sed "s|^ReadWritePaths=.*|ReadWritePaths=$DATA_DIR $CONFIG_DIR${ROOTS:+ $ROOTS}|" \
  "$SRC_DIR/install/av1d.service" > /etc/systemd/system/av1d.service
systemctl daemon-reload
echo "installed av1d.service (ReadWritePaths covers: $DATA_DIR $CONFIG_DIR $ROOTS)"
echo "configure library_roots in $CONFIG_DIR/config.json, rerun this"
echo "installer to refresh ReadWritePaths, then: systemctl enable --now av1d"
echo
echo "diagnostics: python3 -m av1tpu.tools.doctor $CONFIG_DIR/config.json"
